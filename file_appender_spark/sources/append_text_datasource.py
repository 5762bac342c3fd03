"""The append-text layout as a first-class Spark data source
(Spark 4 Python DataSource API): ``spark.read.format("append_text")``.

The reference exposes its written FileSet to SQL by registering a
Hive/Explore text table with a stored field delimiter
(FileAppenderSink.java:96-99; delimiter property 92-105) — i.e. the
format IS a queryable source, not just sink output. The engine's
production read path for that layout is ``catalog.read_delimited``
(JVM csv reader — always prefer it in a hot path); THIS module is the
extensibility surface: the same layout wired through
``pyspark.sql.datasource``, the mechanism you'd use for a format the
JVM has no reader for at all. It demonstrates the full contract:

- driver-side file listing -> one ``InputPartition`` PER DATA FILE,
  so a directory of N rotated files reads with N-way parallelism
  (mirrors the sink's one-writer-per-file protocol in reverse);
- executor-side parse via ``pyarrow.csv`` yielding Arrow
  RecordBatches (vectorized transfer — never row-at-a-time Python
  tuples);
- the serializer's inverse mapping (SURVEY.md §1.4.6): naive join =>
  quoting disabled; null was written as "" => "" reads back as null.

Usage::

    spark.dataSource.register(AppendTextDataSource)
    df = (spark.read.format("append_text")
          .schema("name string, age int")     # or .option("ddl", ...)
          .option("sep", ",")
          .load(path))
"""

from __future__ import annotations

import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)
from pyspark.sql import types as T

_ARROW_TYPES = {
    "string": "string",
    "integer": "int32",
    "long": "int64",
    "float": "float32",
    "double": "float64",
    "boolean": "bool",
    "timestamp": "timestamp[us]",
    "date": "date32",
}


class AppendTextDataSource(DataSource):
    """``format("append_text")``: reads directories written by
    ``sinks.append_text`` (A1-A15) back as a DataFrame (A16)."""

    @classmethod
    def name(cls) -> str:
        return "append_text"

    def schema(self):
        ddl = self.options.get("ddl")
        if not ddl:
            raise ValueError(
                "append_text needs a schema: pass .schema(ddl) or .option('ddl', ...)"
                " — the written text carries no header (docs/"
                "FileAppender-batchsink.md:6-8)"
            )
        return ddl

    def reader(self, schema: T.StructType) -> "AppendTextReader":
        return AppendTextReader(schema, self.options)

    def simpleStreamReader(self, schema: T.StructType) -> "AppendTextStreamReader":
        return AppendTextStreamReader(schema, self.options)


class AppendTextReader(DataSourceReader):
    def __init__(self, schema: T.StructType, options: dict):
        self.schema = schema
        self.path = options.get("path")
        if not self.path:
            raise ValueError("append_text: no path given to load()")
        self.sep = options.get("sep", ",")

    def partitions(self) -> list[InputPartition]:
        """One partition per data file: a metadata-only driver
        listing, parallelism = file count (the rotation protocol
        keeps files near the size threshold, so partitions are
        naturally balanced)."""
        files = [
            e.path
            for e in os.scandir(self.path)
            if e.is_file()
            and not e.name.startswith(("_", "."))
            and os.path.getsize(e.path) > 0
        ]
        if not files:
            # the API calls read() at least once even for an empty
            # source: hand it one sentinel partition that yields nothing
            return [InputPartition(None)]
        return [InputPartition(f) for f in sorted(files)]

    def read(self, partition: InputPartition):
        """Parse one file with pyarrow.csv and yield Arrow record
        batches (vectorized; the Python source API ships Arrow
        buffers, not pickled rows)."""
        import pyarrow as pa
        import pyarrow.csv as pacsv

        if partition is None or partition.value is None:  # empty source
            return

        names = [f.name for f in self.schema.fields]
        column_types = {
            f.name: pa.type_for_alias(
                _ARROW_TYPES.get(f.dataType.typeName(), "string")
            )
            for f in self.schema.fields
        }
        table = pacsv.read_csv(
            partition.value,
            read_options=pacsv.ReadOptions(column_names=names),
            # naive-join format: the sink never quotes or escapes
            parse_options=pacsv.ParseOptions(
                delimiter=self.sep, quote_char=False, escape_char=False
            ),
            # inverse of the serializer's null->"" rule
            convert_options=pacsv.ConvertOptions(
                column_types=column_types,
                null_values=[""],
                strings_can_be_null=True,
            ),
        )
        yield from table.to_batches()


def _parse_line(line: str, sep: str, fields) -> tuple:
    """Invert the serializer (SURVEY.md §1.4.6): naive split on the
    separator, "" -> null, then per-field scalar parse."""
    import datetime

    parts = line.split(sep)
    out = []
    for raw, f in zip(parts, fields):
        if raw == "":
            out.append(None)
            continue
        t = f.dataType.typeName()
        if t in ("integer", "long"):
            out.append(int(raw))
        elif t in ("float", "double"):
            out.append(float(raw))
        elif t == "boolean":
            out.append(raw == "true")
        elif t == "timestamp":
            out.append(datetime.datetime.fromisoformat(raw))
        else:
            out.append(raw)
    return tuple(out)


class AppendTextStreamReader(SimpleDataSourceStreamReader):
    """Streaming tail of an append-text directory: the capability the
    reference DECLARES but never implements (pom.xml:246-247 lists
    the `cdap-data-streams` parent artifact, yet the plugin code is
    batch-only — FileAppenderSink.java:52). Offsets are plain
    ``{file_name: byte_position}`` dicts; each microbatch reads every
    file's [last_offset, last_complete_line) byte range, so a line
    the writer is mid-appending is never half-consumed — the offset
    only ever advances to a newline boundary.

    Replay is exact: ``readBetweenOffsets`` re-reads the recorded
    byte ranges verbatim, which is what makes checkpoint recovery
    exactly-once into a transactional sink. Driver-side reading is
    the right trade here BY CONSTRUCTION: the sink's rotation
    thresholds bound per-file growth, and a microbatch's delta is the
    recent appends, not the table."""

    def __init__(self, schema: T.StructType, options: dict):
        self.schema = schema
        self.path = options.get("path")
        if not self.path:
            raise ValueError("append_text stream: no path given to load()")
        self.sep = options.get("sep", ",")

    def _data_files(self) -> list[str]:
        if not os.path.isdir(self.path):
            return []
        return sorted(
            e.name
            for e in os.scandir(self.path)
            if e.is_file() and not e.name.startswith(("_", "."))
        )

    def _complete_bytes(self, name: str) -> int:
        """Offset just past the last complete line (newline-terminated
        prefix length; a trailing partial line stays unconsumed)."""
        full = os.path.join(self.path, name)
        size = os.path.getsize(full)
        if size == 0:
            return 0
        with open(full, "rb") as f:
            f.seek(max(0, size - 1))
            if f.read(1) == b"\n":
                return size
            # scan back for the last newline (appends are line-sized,
            # so this window is tiny)
            back = min(size, 1 << 16)
            f.seek(size - back)
            buf = f.read(back)
            pos = buf.rfind(b"\n")
            return size - back + pos + 1 if pos >= 0 else 0

    def initialOffset(self) -> dict:
        return {}  # consume from the beginning of every file

    def read(self, start: dict):
        end = {n: self._complete_bytes(n) for n in self._data_files()}
        # keep already-seen files in the offset even if unlisted now
        for n, off in start.items():
            end[n] = max(end.get(n, 0), off)
        return iter(list(self.readBetweenOffsets(start, end))), end

    def readBetweenOffsets(self, start: dict, end: dict):
        fields = self.schema.fields
        for name, hi in sorted(end.items()):
            lo = start.get(name, 0)
            if hi <= lo:
                continue
            full = os.path.join(self.path, name)
            with open(full, "rb") as f:
                f.seek(lo)
                chunk = f.read(hi - lo).decode("utf-8")
            for line in chunk.splitlines():
                yield _parse_line(line, self.sep, fields)
