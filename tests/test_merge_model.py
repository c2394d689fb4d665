"""Model-based property test for VersionedParquetTable: a random
bounded sequence of {upsert, eager delete, merge-on-read delete,
compaction, rollback} applied BOTH to the table and to a plain Python
dict-history model, comparing the full read after every step. The
hash-parity gate proves each op in isolation; this catches the
INTERACTIONS (tombstones × hard-linked partitions × rollback ×
retention) — exactly the class the round-7 advisor findings lived in.
"""

from __future__ import annotations

import pytest

try:
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st
except ImportError:  # pragma: no cover
    pytest.skip("hypothesis unavailable", allow_module_level=True)

from pyspark.sql import Row

from openweathermapapi_etl_spark.operators.merge import VersionedParquetTable

KEYS = ["k1", "k2", "k3", "k4"]


def _part(k: str) -> str:
    # Partition column functionally dependent on the key (the
    # documented requirement for partition-pruned merges).
    return f"p{(ord(k[-1]) - ord('1')) % 3}"


def _df(spark, batch: dict[str, int]):
    return spark.createDataFrame(
        [Row(k=k, ord=o, val=_part(k)) for k, o in batch.items()],
        schema="k string, ord int, val string",
    )


_op = st.one_of(
    st.tuples(
        st.just("upsert"),
        st.dictionaries(st.sampled_from(KEYS), st.integers(0, 9), min_size=1),
    ),
    st.tuples(
        st.just("delete"),
        st.lists(st.sampled_from(KEYS), min_size=1, max_size=2, unique=True),
    ),
    st.tuples(
        st.just("mor"),
        st.lists(st.sampled_from(KEYS), min_size=1, max_size=2, unique=True),
    ),
    st.tuples(st.just("compact"), st.none()),
    st.tuples(st.just("rollback"), st.integers(0, 5)),
)


@pytest.mark.parametrize("partition_by", [None, "val"])
@given(ops=st.lists(_op, min_size=1, max_size=6))
@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_random_op_sequences_match_dict_model(
    spark, tmp_path_factory, partition_by, ops
):
    root = str(tmp_path_factory.mktemp("model"))
    table = VersionedParquetTable(root, partition_by=partition_by, retain=10)
    model: dict[str, int] = {"k1": 0, "k2": 0}
    table.overwrite(_df(spark, model))
    history = {table.current_version(): dict(model)}

    for op, arg in ops:
        if op == "upsert":
            table.upsert(spark, _df(spark, arg), keys=["k"], order_col="ord")
            for k, o in arg.items():
                # last-write-wins on ord: the merge keeps the max ord
                # within the batch per key; vs existing, batch wins.
                model[k] = max(
                    o, *(v for kk, v in arg.items() if kk == k)
                )
        elif op == "delete":
            table.delete(
                spark,
                spark.createDataFrame([(k,) for k in arg], "k string"),
                keys=["k"],
            )
            for k in arg:
                model.pop(k, None)
        elif op == "mor":
            table.delete_mor(
                spark,
                spark.createDataFrame([(k,) for k in arg], "k string"),
                keys=["k"],
            )
            for k in arg:
                model.pop(k, None)
        elif op == "compact":
            table.apply_deletes(spark)
        elif op == "rollback":
            candidates = sorted(
                v
                for v in history
                if v in table.versions() and v < (table.current_version() or 0)
            )
            if not candidates:
                continue
            target = candidates[arg % len(candidates)]
            table.rollback(target)
            model = dict(history[target])
        history[table.current_version()] = dict(model)

        got = {
            (r["k"], r["ord"])
            for r in table.read(spark).select("k", "ord").collect()
        }
        want = {(k, o) for k, o in model.items()}
        assert got == want, f"after {op}({arg}): {got} != {want}"
