"""B64 — a Spark 4 Python DataSource SINK with a real commit protocol.

The reader half of the Python DataSource API is covered by A1b
(streaming/http_datasource.py); this module covers the WRITER half:
``DataSource.writer`` → per-task ``DataSourceWriter.write`` returning a
``WriterCommitMessage`` → driver-side ``commit``/``abort`` with the
collected messages. That driver/executor split is Spark's generic sink
commit protocol — the same all-or-nothing discipline the reference gets
from its staging-table + single transactional merge
(/root/reference/dags/weather-etl.py:85-93,152-174), here expressed
through the engine's own API:

- each task writes its rows to ``_tmp_<uuid>.jsonl`` (invisible to
  readers) and reports the file name + row count in its commit message;
- ``commit`` runs ONLY if every task succeeded: it renames the temp
  files to final names and writes a ``_COMMITTED`` manifest listing
  them — the manifest write is the atomic commit point (``os.replace``)
  and readers trust only manifest-listed files;
- ``abort`` (any task failed) removes the temp files; no manifest means
  readers see NOTHING of the failed batch — partial output cannot leak.

Scale notes: rows stream through each task (nothing accumulates beyond
the open file buffer); commit messages are O(tasks) tiny tuples on the
driver, the standard Spark sink-commit cost. Rename-based commit
assumes a posix-rename directory target (object stores swap in a
manifest-only commit — the manifest already carries everything needed).
"""

from __future__ import annotations

import json
import os
import uuid
from dataclasses import dataclass
from typing import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceWriter,
    WriterCommitMessage,
)
from pyspark.sql.types import Row, StructType

MANIFEST = "_COMMITTED"


@dataclass
class _FileCommit(WriterCommitMessage):
    tmp_name: str
    n_rows: int


class _JsonlDirWriter(DataSourceWriter):
    def __init__(self, options: dict) -> None:
        path = options.get("path")
        if not path:
            raise ValueError("jsonl_dir sink requires .option('path', ...)")
        self.path = path
        # Test hook: fail the task that sees this marker value, to prove
        # the abort path (documented, off in production use).
        self.fail_on = options.get("fail_on_value")

    def write(self, iterator: Iterator[Row]) -> _FileCommit:
        os.makedirs(self.path, exist_ok=True)
        tmp = f"_tmp_{uuid.uuid4().hex}.jsonl"
        n = 0
        with open(os.path.join(self.path, tmp), "w", encoding="utf-8") as fh:
            for row in iterator:
                d = row.asDict(recursive=True)
                if self.fail_on is not None and self.fail_on in [
                    str(v) for v in d.values()
                ]:
                    raise RuntimeError(
                        f"injected task failure on value {self.fail_on!r}"
                    )
                fh.write(json.dumps(d, sort_keys=True, default=str) + "\n")
                n += 1
        return _FileCommit(tmp_name=tmp, n_rows=n)

    def commit(self, messages) -> None:
        files = []
        for i, m in enumerate(messages):
            if m is None:
                continue
            final = f"part-{i:05d}.jsonl"
            os.replace(
                os.path.join(self.path, m.tmp_name),
                os.path.join(self.path, final),
            )
            files.append({"file": final, "n_rows": m.n_rows})
        manifest_tmp = os.path.join(self.path, MANIFEST + ".tmp")
        with open(manifest_tmp, "w") as fh:
            json.dump({"files": files}, fh)
        # The atomic commit point: readers trust only manifest-listed
        # files, and the manifest appears all-at-once or not at all.
        os.replace(manifest_tmp, os.path.join(self.path, MANIFEST))

    def abort(self, messages) -> None:
        for m in messages:
            if m is None:
                continue
            try:
                os.unlink(os.path.join(self.path, m.tmp_name))
            except OSError:
                pass


class JsonlDirDataSource(DataSource):
    """``df.write.format("jsonl_dir").option("path", d).mode("append").save()``"""

    @classmethod
    def name(cls) -> str:
        return "jsonl_dir"

    def writer(self, schema: StructType, overwrite: bool) -> _JsonlDirWriter:
        return _JsonlDirWriter(self.options)


def committed_files(path: str) -> list[str]:
    """The reader-side contract: ONLY manifest-listed files exist as far
    as consumers are concerned. Returns absolute paths, [] if no commit
    ever succeeded."""
    try:
        with open(os.path.join(path, MANIFEST)) as fh:
            manifest = json.load(fh)
    except OSError:
        return []
    return [os.path.join(path, f["file"]) for f in manifest["files"]]
