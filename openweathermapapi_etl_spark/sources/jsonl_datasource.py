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

- each task writes its rows to ``_tmp_<commit>_<uuid>.jsonl``
  (invisible to readers) and reports the file name + row count in its
  commit message;
- ``commit`` runs ONLY if every task succeeded: it renames the temp
  files to per-commit-unique final names and writes a ``_COMMITTED``
  manifest — the manifest write is the atomic commit point
  (``os.replace``) and readers trust only manifest-listed files;
  append mode MERGES the manifest with prior commits, overwrite
  replaces it and unlinks the superseded files after the swing;
- ``abort`` (any task failed) removes every temp carrying this run's
  commit id — including the failed task's own partial file, which
  never reported a commit message; no manifest update means readers
  see NOTHING of the failed batch — partial output cannot leak.

Scale notes: rows stream through each task (nothing accumulates beyond
the open file buffer); commit messages are O(tasks) tiny tuples on the
driver, the standard Spark sink-commit cost. Rename-based commit
assumes a posix-rename directory target (object stores swap in a
manifest-only commit — the manifest already carries everything needed).
"""

from __future__ import annotations

import json
import os
import time
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
    def __init__(self, options: dict, overwrite: bool) -> None:
        path = options.get("path")
        if not path:
            raise ValueError("jsonl_dir sink requires .option('path', ...)")
        self.path = path
        # Honor the save mode (r11 review catch: the flag was dropped
        # and every commit behaved as overwrite-with-collisions —
        # fixed part-NNNNN names clobbered earlier parts and the
        # manifest was replaced wholesale, so two .mode("append")
        # saves silently destroyed the first batch). Final names now
        # carry a per-commit uuid (collision-free across commits);
        # append MERGES the manifest, overwrite replaces it and
        # removes the superseded committed files.
        self.overwrite = overwrite
        self.commit_id = uuid.uuid4().hex[:12]
        # Test hook: fail the task that sees this marker value, to prove
        # the abort path (documented, off in production use).
        self.fail_on = options.get("fail_on_value")

    def write(self, iterator: Iterator[Row]) -> _FileCommit:
        os.makedirs(self.path, exist_ok=True)
        # The commit id prefixes TEMP names too: abort() receives
        # messages only from tasks that RETURNED one, so a task that
        # died mid-write leaked its temp forever (r11 review catch) —
        # the prefix lets the driver glob away every temp of THIS run
        # regardless of which tasks reported.
        tmp = f"_tmp_{self.commit_id}_{uuid.uuid4().hex}.jsonl"
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

    def _manifest_files(self) -> list[dict]:
        # ONLY a missing manifest means "no prior commits". Any other
        # read/parse failure (permissions, truncated JSON, missing
        # "files" key) must ABORT the commit: swallowing it here would
        # make append mode atomically replace a manifest it could not
        # read with only the new batch's files — silently dropping
        # every previously committed file from readers (r12 advisor
        # catch; the same silent-data-loss class fixed in merge.py).
        try:
            with open(os.path.join(self.path, MANIFEST)) as fh:
                return list(json.load(fh)["files"])
        except FileNotFoundError:
            return []
        except (OSError, ValueError, KeyError) as e:
            raise RuntimeError(
                f"unreadable sink manifest at "
                f"{os.path.join(self.path, MANIFEST)} — refusing to "
                f"commit over committed history it cannot merge: {e}"
            ) from e

    def commit(self, messages) -> None:
        files = []
        for i, m in enumerate(messages):
            if m is None:
                continue
            final = f"part-{self.commit_id}-{i:05d}.jsonl"
            os.replace(
                os.path.join(self.path, m.tmp_name),
                os.path.join(self.path, final),
            )
            files.append({"file": final, "n_rows": m.n_rows})
        # The manifest update is a read-modify-write (append merges the
        # prior list); a short exclusive lock file serializes concurrent
        # saves to the same path so the second committer can't erase the
        # first's files from the manifest (r12 advisor catch — same
        # discipline as the version store's _COMMIT_LOCK). Bounded
        # retries, then fail loudly: a writer that died holding it
        # leaves the lock behind, removable once confirmed dead.
        lock = os.path.join(self.path, MANIFEST + ".lock")
        fd = None
        for _ in range(200):
            try:
                fd = os.open(lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
                break
            except FileExistsError:
                time.sleep(0.05)
        if fd is None:
            raise RuntimeError(
                f"sink manifest lock held at {lock} — another writer is "
                f"mid-commit (or died holding it; remove after fencing)"
            )
        try:
            prior = self._manifest_files()
            manifest = files if self.overwrite else prior + files
            manifest_tmp = os.path.join(
                self.path, f"{MANIFEST}.{self.commit_id}.tmp"
            )
            with open(manifest_tmp, "w") as fh:
                json.dump({"files": manifest}, fh)
            # The atomic commit point: readers trust only manifest-listed
            # files, and the manifest appears all-at-once or not at all.
            os.replace(manifest_tmp, os.path.join(self.path, MANIFEST))
        finally:
            os.close(fd)
            os.unlink(lock)
        if self.overwrite:
            # Superseded data files are unreachable the instant the
            # manifest swings; removing them afterwards is cleanup,
            # not part of the commit point.
            keep = {f["file"] for f in files}
            for f in prior:
                if f["file"] not in keep:
                    try:
                        os.unlink(os.path.join(self.path, f["file"]))
                    except OSError:
                        pass

    def abort(self, messages) -> None:
        # Glob by this run's commit-id prefix, not the message list:
        # the FAILED task (the reason abort runs) never returned a
        # message, so its partial temp is invisible to the list and
        # accumulated forever under the old spelling.
        import glob as _glob

        for p in _glob.glob(
            os.path.join(self.path, f"_tmp_{self.commit_id}_*.jsonl")
        ):
            try:
                os.unlink(p)
            except OSError:
                pass


class JsonlDirDataSource(DataSource):
    """``df.write.format("jsonl_dir").option("path", d).mode("append").save()``"""

    @classmethod
    def name(cls) -> str:
        return "jsonl_dir"

    def writer(self, schema: StructType, overwrite: bool) -> _JsonlDirWriter:
        return _JsonlDirWriter(self.options, overwrite)


def committed_files(path: str) -> list[str]:
    """The reader-side contract: ONLY manifest-listed files exist as far
    as consumers are concerned. Returns absolute paths, [] if no commit
    ever succeeded."""
    try:
        with open(os.path.join(path, MANIFEST)) as fh:
            manifest = json.load(fh)
    except FileNotFoundError:
        # Missing manifest = no commit ever succeeded. Any OTHER read
        # failure raises: an EACCES/truncated manifest is not "empty".
        return []
    return [os.path.join(path, f["file"]) for f in manifest["files"]]
