"""C7 — deterministic sampling & dataset-mixing operators for
training-data pipelines: hash-based train/val/test split, stratified
per-group sampling, and weighted mixture expansion.

All three are the shapes a 100 TB curation job actually runs:

- **hash_split** is pure row-local column arithmetic — zero shuffle,
  scan speed, and *stable*: a document lands in the same split on
  every run, on every cluster, regardless of partitioning, because
  the bucket is a content-independent hash of its id (the property
  random() cannot give you, and the reason training pipelines never
  split with rand()).
- **stratified_sample** is one window per stratum — a single hash
  shuffle on the strata key; the hash order key makes the sample
  deterministic AND unbiased (hash order is uncorrelated with any
  data column).
- **mixture_expand** is a row-multiplying projection (explode of a
  per-row sequence) — no shuffle; upsampling weights are the standard
  way training mixes oversample high-quality sources.

The portable :func:`~.text.char_fold_hash` keeps every one of them
bit-reproducible in the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import char_fold_hash, hash_scramble


def split_bucket(key: Column, salt: str = "split", n_buckets: int = 100) -> Column:
    """Deterministic bucket in [0, n_buckets) from a salted key hash.

    The salt decorrelates the split from any other use of the same
    hash on the same key (e.g. sampling): different salt → independent
    bucket assignment. The fold hash goes through
    :func:`~.text.hash_scramble` before the modulus — without it,
    consecutive ids land in consecutive buckets and two salts of the
    same length produce the SAME relative order (the fold hash is
    order-preserving in trailing characters), which silently
    correlates splits, sample order, and any id-adjacent structure.
    """
    return F.pmod(
        hash_scramble(
            char_fold_hash(F.concat(F.lit(salt + ":"), key.cast("string")))
        ),
        F.lit(n_buckets),
    )


def hash_split(
    df: DataFrame,
    key_col: str,
    train_pct: int = 80,
    val_pct: int = 10,
    salt: str = "split",
) -> DataFrame:
    """Add (split_bucket, split) columns: 'train' / 'val' / 'test' by
    hash bucket of the salted key — row-local, shuffle-free, stable
    across runs and cluster layouts.

    NULL keys FAIL the job rather than route anywhere: a NULL bucket
    satisfies neither ``when`` branch, so the old ``otherwise`` path
    silently concentrated every malformed row (bad upstream join,
    optional key) in the held-out TEST split — contamination invisible
    until eval time (r11 review catch). A corpus with legitimately
    NULL keys must pre-filter or pre-coalesce them explicitly.
    """
    b = split_bucket(F.col(key_col), salt)
    split = (
        F.when(
            F.col(key_col).isNull(),
            F.raise_error(
                F.lit(
                    f"hash_split: NULL {key_col} — a NULL key cannot be "
                    "deterministically split and would silently land in "
                    "'test'; filter or coalesce NULL keys explicitly"
                )
            ),
        )
        .when(b < train_pct, F.lit("train"))
        .when(b < train_pct + val_pct, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return df.withColumn("split_bucket", b).withColumn("split", split)


def stratified_sample(
    df: DataFrame,
    strata_cols: list[str],
    n_per_stratum: int,
    key_col: str,
    salt: str = "sample",
) -> DataFrame:
    """First ``n_per_stratum`` rows per stratum in deterministic hash
    order (hash, then key as tiebreak — total order, so the sample is
    unique). Adds ``sample_rank`` (1-based). One shuffle on the strata
    key; rank cutoff happens inside the window, so only the window
    sort pays for oversized strata."""
    from pyspark.sql import Window as W

    order = split_bucket(F.col(key_col), salt, n_buckets=1_000_000_007)
    w = W.partitionBy(*strata_cols).orderBy(order.asc(), F.col(key_col).asc())
    return (
        df.withColumn("sample_rank", F.row_number().over(w))
        .filter(F.col("sample_rank") <= n_per_stratum)
    )


def mixture_expand(df: DataFrame, weight: Column) -> DataFrame:
    """Weighted mixture expansion: repeat each row ``weight`` times
    (integer weights; 0 drops the row), adding ``copy_no`` in
    [0, weight). Row-multiplying projection, no shuffle — downstream
    shuffles (e.g. a global shuffle-for-training-order) see the
    already-expanded stream.

    Guarded: ``F.sequence(0, -1)`` generates a *descending* [0, -1]
    (the word_shingles pitfall), which would emit two copies of a
    weight-0 row instead of dropping it — so non-positive weights
    short-circuit to an empty array before the explode."""
    w = weight.cast("int")
    seq = F.when(w > 0, F.sequence(F.lit(0), w - 1)).otherwise(
        F.array().cast("array<int>")
    )
    return df.withColumn("copy_no", F.explode(seq))


def sequence_pack(
    df: DataFrame,
    key_col: str,
    n_tokens_col: str,
    budget: int,
    n_shards: int = 8,
    salt: str = "pack",
) -> DataFrame:
    """Concat-and-chunk sequence packing: assign every document a
    position in a token stream and the training sequence ("pack") its
    first token lands in — the assembly step between a curated corpus
    and the training job (GPT-style pretraining concatenates documents
    in order and slices fixed-length sequences; a document belongs to
    pack ``floor(stream_offset / budget)``).

    Adds (shard, stream_offset, pack_id): documents are first sharded
    by salted key hash — sharding is what makes packing DISTRIBUTED,
    one independent stream per shard instead of one global sequential
    stream — then ordered deterministically within the shard (hash,
    then key: total order → reproducible packs on any cluster layout),
    and the running token offset is a window cumulative sum. One
    shuffle on the shard key; the window frame is
    rows-unbounded-preceding, which Spark evaluates streamingly (no
    per-partition buffering beyond the running total).
    """
    from pyspark.sql import Window as W

    # split_bucket, NOT the raw fold hash: hash_scramble is
    # load-bearing for shard INDEPENDENCE — the polynomial fold of
    # same-length keys is order-preserving and salt-shifts every
    # same-length key by the same constant, so raw-hash sharding puts
    # consecutive ids in consecutive shards and a salt change only
    # ROTATES the assignment (r11 review catch; split_bucket's own
    # docstring states exactly this hazard).
    shard = split_bucket(F.col(key_col), salt, n_buckets=n_shards)
    order = split_bucket(F.col(key_col), salt + "-order", n_buckets=1_000_000_007)
    out = df.withColumn("shard", shard)
    w = (
        W.partitionBy("shard")
        .orderBy(order.asc(), F.col(key_col).asc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    running = F.sum(F.col(n_tokens_col)).over(w)
    offset = (running - F.col(n_tokens_col)).alias("stream_offset")
    return out.select(
        "*",
        offset,
        F.floor((running - F.col(n_tokens_col)) / budget).alias("pack_id"),
    )


def weighted_sample(
    df: DataFrame,
    key_col: str,
    weight_col: Column | str,
    n: int,
    salt: str = "wsample",
    priority_name: str = "_priority",
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement: take ``n``
    rows where a row's inclusion probability is proportional to its
    weight — the curation move behind "sample more from high-quality
    sources" when a full mixture_expand pass is too big.

    The Efraimidis–Spirakis A-ES scheme, derandomized: each row gets
    priority ``u^(1/w)`` for ``u`` uniform in (0,1); the n largest
    priorities are a weighted sample. Here ``u`` comes from the salted
    portable hash of the key (→ reproducible on any cluster layout,
    same property as hash_split), compared in log form
    ``ln(u)/w`` (monotone in ``u^(1/w)``, avoids underflow at large
    weights). Rows with non-positive weight are excluded, matching
    w→0 inclusion probability 0.

    Selection is ``ORDER BY priority DESC, key LIMIT n`` — Spark plans
    TakeOrderedAndProject (per-partition top-n heaps, then n rows to
    one reducer), so the shuffle carries ``n × partitions`` rows, not
    the corpus: scale-safe at any corpus size for sane ``n``.
    """
    key = F.col(key_col)
    w = (F.col(weight_col) if isinstance(weight_col, str) else weight_col).cast(
        "double"
    )
    # u in (0,1): (hash+1) / (P+1) — hash in [0, P), both bounds open.
    p = 1_000_000_007
    u = (
        split_bucket(key, salt, n_buckets=p).cast("double") + F.lit(1.0)
    ) / F.lit(float(p + 1))
    pri = F.log(u) / w
    return (
        df.filter(w > 0)
        .withColumn(priority_name, pri)
        .orderBy(F.col(priority_name).desc(), key.asc())
        .limit(n)
    )


def length_buckets(
    df: DataFrame,
    len_col: Column | str,
    pad_to: int = 64,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Length-bucket statistics for training-batch shaping: pad every
    sequence length up to the next multiple of ``pad_to`` and report,
    per bucket (and optional extra ``group_cols``), the document count,
    real token total, padded token total, and padding-waste fraction.

    This is the planning pass behind length-bucketed batching — group
    sequences of similar length so attention/padding FLOPs aren't
    wasted on short rows padded to the batch max. Pure integer
    arithmetic up to the final waste division (exact longs → one
    IEEE division), so the report is bit-stable across engines.

    Row-local bucket assignment + ONE hash aggregation keyed on
    (bucket, *group_cols) — cardinality is max_len/pad_to × groups,
    tiny at any corpus size; the shuffle carries partial sums only.
    Zero-length rows land in the ``pad_to`` bucket (a real row still
    occupies a padded slot).
    """
    n = F.col(len_col) if isinstance(len_col, str) else len_col
    # ceil(n / pad_to) * pad_to in pure long arithmetic (m - m % pad):
    # no double division anywhere near the bucket id.
    m = F.greatest(n.cast("long"), F.lit(1)) + F.lit(pad_to - 1).cast("long")
    bucket = m - (m % F.lit(pad_to).cast("long"))
    keys = [bucket.alias("bucket_len"), *(group_cols or [])]
    return (
        df.groupBy(*keys)
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(n.cast("long")).alias("total_tokens"),
        )
        .withColumn(
            "padded_tokens", F.col("bucket_len") * F.col("n_docs")
        )
        .withColumn(
            "waste_frac",
            (F.col("padded_tokens") - F.col("total_tokens")).cast("double")
            / F.col("padded_tokens").cast("double"),
        )
    )


def epoch_shuffle(
    df: DataFrame,
    id_col: str = "doc_id",
    n_epochs: int = 2,
    salt: str = "eshuf",
    out_col: str = "pos",
    pin: bool = True,
) -> DataFrame:
    """Deterministic per-epoch corpus reshuffle: for each training
    epoch, assign every row a 1-based position in a pseudo-random
    permutation keyed on (salt, epoch, id) — different order every
    epoch, IDENTICAL order for the same epoch on any cluster layout or
    rerun. This is the data-order half of training reproducibility: a
    run that crashes mid-epoch 3 resumes from position k of the same
    permutation instead of a new random order.

    The permutation key is the portable polynomial hash pushed through
    a NONLINEAR scramble ``((h² mod P)·M + h) mod P``. The scramble is
    load-bearing: the polynomial fold of same-length strings is
    order-preserving in the last characters (ids i and i+1 hash 1
    apart, epochs shift every hash by the same 31²·Δ), so the raw hash
    would "shuffle" consecutive ids to consecutive positions and every
    epoch to the SAME order. The quadratic cross-term makes the
    relative order genuinely differ per epoch; everything stays exact
    int64 arithmetic (max intermediate ≈ 2.7e18), so the oracle
    reproduces it bit-for-bit. Ties (x² ≡ (P−x)² mod P pairs) break by
    id. Positions come from :func:`~.rank.global_rank` over (epoch,
    key, id) — one range shuffle of n_epochs x N rows, no
    single-reducer window — then rebased per epoch by subtracting
    epoch x N (a broadcast 1-row count; the range order puts epochs in
    contiguous blocks, so the rebase is exact integer arithmetic).

    Returns (epoch, id_col, out_col).
    """
    from .rank import global_rank

    epochs = (
        df.sparkSession.range(n_epochs)
        .select(F.col("id").cast("int").alias("epoch"))
    )
    h = char_fold_hash(
        F.concat(
            F.lit(f"{salt}:"),
            F.col("epoch").cast("string"),
            F.lit(":"),
            F.col(id_col).cast("string"),
        )
    )
    keyed = (
        df.select(id_col)
        .crossJoin(F.broadcast(epochs))
        .withColumn("_h", hash_scramble(h))
    )
    # pin defaults True like global_rank's own: pass pin=False only
    # when df's lineage is deterministic (plain scans), where recompute
    # reproduces identical partitions (see rank.py pinning policy).
    ranked = global_rank(
        keyed,
        [F.col("epoch"), F.col("_h"), F.col(id_col)],
        rank_name="_grnk",
        pin=pin,
    )
    # N for the per-epoch rebase comes from the RANKED frame itself —
    # ranked rows / n_epochs — not from a separate df.count() branch:
    # a second pass over df re-executes its lineage, and when that
    # lineage is nondeterministic (the stated reason pin defaults
    # True) the count can disagree with the rows actually ranked,
    # shifting every epoch's positions by e·(N−N') — silent
    # permutation corruption (r11 review catch). Reading ranked is
    # consistent by construction (pinned via localCheckpoint when
    # pin=True) and skips the extra full scan of df.
    total = ranked.agg(
        (F.count("*") / F.lit(n_epochs)).cast("long").alias("_n")
    )
    return (
        ranked.crossJoin(F.broadcast(total))  # 1-row count frame
        .select(
            "epoch",
            id_col,
            (F.col("_grnk") - F.col("epoch").cast("long") * F.col("_n")).alias(
                out_col
            ),
        )
    )


def domain_mix_plan(
    df: DataFrame,
    domain_col: str,
    tokens_col: str,
    weights: dict[str, float],
    budget_tokens: int,
) -> DataFrame:
    """C7o: domain-mixture planning — given per-document token counts,
    a target mixture (domain → weight) and a total token budget,
    report per domain how many tokens exist, how many the mixture
    wants, and the repetition factor (epochs) needed to fill the gap.
    This is the static planning half of a DoReMi/DoGE-style mixture
    loop: the trainer's sampler consumes exactly this table (domains
    with ``epochs > 1`` are upsampled/repeated, ``epochs < 1``
    subsampled; :func:`mixture_expand` and :func:`weighted_sample` are
    the executors of the plan downstream).

    Weights for domains absent from ``weights`` default to 0 (domain
    excluded). Arithmetic: token sums are exact int64; ``target`` is
    one IEEE multiply of the literal weight by the int budget and
    ``epochs`` one division — row-local, bit-stable across engines.
    Shape: one map-side-combinable groupBy over |domains| keys; no
    joins (the weight table is a literal CASE/map, not a shuffle).

    Returns (domain, n_docs, available_tokens, weight, target_tokens,
    epochs, needs_upsampling), one row per domain present in ``df``.
    """
    wmap = F.create_map(
        *[F.lit(x) for kv in weights.items() for x in kv]
    )
    agg = df.groupBy(F.col(domain_col).alias("domain")).agg(
        F.count("*").alias("n_docs"),
        F.sum(F.col(tokens_col).cast("long")).alias("available_tokens"),
    )
    w = F.coalesce(wmap[F.col("domain")], F.lit(0.0))
    target = w * F.lit(float(budget_tokens))
    return agg.select(
        "domain",
        "n_docs",
        "available_tokens",
        w.alias("weight"),
        target.alias("target_tokens"),
        (target / F.col("available_tokens").cast("double")).alias("epochs"),
        (target > F.col("available_tokens").cast("double")).alias(
            "needs_upsampling"
        ),
    )


def shard_balance(
    groups: DataFrame,
    size_col: str,
    n_shards: int,
    shard_name: str = "shard",
) -> DataFrame:
    """Assign groups to ``n_shards`` near-balanced shards: serpentine
    round-robin in descending size order (rank 1..N forward, N+1..2N
    backward, ...) — the deterministic, fully-distributed relaxation
    of LPT scheduling (Graham 1969, public literature). True greedy
    LPT ("next group → currently lightest shard") is a sequential
    dependence — a driver loop over millions of groups; the serpentine
    pass needs only a size rank and row-local modular arithmetic, and
    its imbalance is bounded by one maximal group per shard pair
    (boustrophedon pairing cancels the head-vs-tail drift plain
    round-robin accumulates).

    The rank comes from :func:`~.rank.global_rank` on
    ``(-size, group)`` — exchange-aware, no single-reducer window; the
    group inventory is corpus-derived but GROUP-sized, so this whole
    plan is metadata-scale. Ties break on the remaining group columns
    via the rank's total order, making the assignment reproducible
    across runs and engines."""
    from .rank import global_rank

    others = [c for c in groups.columns if c != size_col]
    ranked = global_rank(
        groups.withColumn("_neg", -F.col(size_col)),
        ["_neg", *others],
        rank_name="_r",
    ).drop("_neg")
    cycle = F.pmod(F.col("_r") - 1, F.lit(2 * n_shards))
    shard = F.when(cycle < n_shards, cycle).otherwise(
        F.lit(2 * n_shards) - 1 - cycle
    )
    return ranked.withColumn(shard_name, shard.cast("int")).drop("_r")
