"""COPY ... TO/FROM STDOUT/STDIN and PROGRAM pipes (SURVEY.md A22/A23).

Reference behavior: pg_parquet spools stdin/stdout and program-pipe
copies through an intermediate temp fd because parquet needs a seekable
target (src/arrow_parquet/uri_utils.rs:43-76 — ``tmp_fd`` "used as
intermediate file for copying data to/from stdin/out or program pipes";
``open_program_pipe`` wraps PostgreSQL's ``OpenPipeStream``). The
Spark-side equivalent keeps exactly that shape:

- ``copy_to_stream(df, out)`` — single-file parquet via the engine's own
  sink (all options honored) into a temp file, then streamed in chunks
  to any writable byte stream (the "STDOUT" of a driver process).
- ``copy_from_stream(spark, inp)`` — spool the byte stream to a
  session-owned temp file, then ``read_parquet`` it (lazy frames stay
  valid for the session; files are reclaimed at interpreter exit).
- ``copy_to_program(df, cmd)`` / ``copy_from_program(spark, cmd)`` —
  ``COPY ... TO/FROM PROGRAM 'cmd'``: the command runs through the
  shell like OpenPipeStream does, bytes flow through its stdin/stdout.

Scale note: the upstream computation is distributed regardless — only
the final byte funnel is driver-side, exactly as the reference's single
backend is the funnel for its COPY protocol. For cluster-scale exports
use the directory/split write paths instead.
"""

from __future__ import annotations

import atexit
import os
import shutil
import subprocess
import tempfile
from typing import BinaryIO

from pyspark.sql import DataFrame, SparkSession

_CHUNK = 1 << 20

#: spooled stdin files live for the session (the returned DataFrame is
#: lazy — executors read the file when the query actually runs)
_SPOOL_DIR: str | None = None


def _spool_dir() -> str:
    global _SPOOL_DIR
    if _SPOOL_DIR is None:
        _SPOOL_DIR = tempfile.mkdtemp(prefix="pgpq_stdin_")
        atexit.register(shutil.rmtree, _SPOOL_DIR, ignore_errors=True)
    return _SPOOL_DIR


def copy_to_stream(df: DataFrame, out: BinaryIO, **write_options) -> int:
    """COPY TO STDOUT: write ``df`` as ONE parquet file (full options
    surface) and stream its bytes to ``out``. Returns the byte count."""
    from pg_parquet_spark.sources.writer import write_parquet

    tmp = tempfile.mkdtemp(prefix="pgpq_stdout_")
    try:
        path = os.path.join(tmp, "out.parquet")
        write_parquet(df, path, **write_options)
        total = 0
        with open(path, "rb") as f:
            while True:
                chunk = f.read(_CHUNK)
                if not chunk:
                    break
                out.write(chunk)
                total += len(chunk)
        return total
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def _spool(inp: BinaryIO) -> str:
    fd, path = tempfile.mkstemp(suffix=".parquet", dir=_spool_dir())
    with os.fdopen(fd, "wb") as f:
        shutil.copyfileobj(inp, f, _CHUNK)
    return path


def copy_from_stream(spark: SparkSession, inp: BinaryIO, **read_options) -> DataFrame:
    """COPY FROM STDIN: spool parquet bytes from ``inp`` to a
    session-owned temp file and read it through the engine reader."""
    from pg_parquet_spark.sources.reader import read_parquet

    return read_parquet(spark, _spool(inp), **read_options)


def copy_to_program(df: DataFrame, command: str, **write_options) -> int:
    """COPY TO PROGRAM 'command': stream the parquet bytes into the
    command's stdin (shell semantics, matching OpenPipeStream)."""
    proc = subprocess.Popen(command, shell=True, stdin=subprocess.PIPE)
    assert proc.stdin is not None
    broken = False
    try:
        try:
            total = copy_to_stream(df, proc.stdin, **write_options)
        except BrokenPipeError:
            # program exited before draining its stdin — report its
            # status below rather than the pipe error
            broken = True
            total = 0
    finally:
        try:
            proc.stdin.close()
        except BrokenPipeError:  # pragma: no cover - close-time flush
            broken = True
        rc = proc.wait()
    if rc != 0 or broken:
        raise RuntimeError(f"program exited with status {rc}: {command}")
    return total


def copy_from_program(
    spark: SparkSession, command: str, **read_options
) -> DataFrame:
    """COPY FROM PROGRAM 'command': read parquet bytes from the
    command's stdout."""
    from pg_parquet_spark.sources.reader import read_parquet

    proc = subprocess.Popen(command, shell=True, stdout=subprocess.PIPE)
    assert proc.stdout is not None
    try:
        # drain fully BEFORE checking status — the program must have
        # succeeded before its output is interpreted as parquet
        path = _spool(proc.stdout)
    finally:
        proc.stdout.close()
        rc = proc.wait()
    if rc != 0:
        raise RuntimeError(f"program exited with status {rc}: {command}")
    return read_parquet(spark, path, **read_options)
