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

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
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
        return [InputPartition(f) for f in sorted(files)]

    def read(self, partition: InputPartition):
        """Parse one file with pyarrow.csv and yield Arrow record
        batches (vectorized; the Python source API ships Arrow
        buffers, not pickled rows)."""
        import pyarrow as pa
        import pyarrow.csv as pacsv

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
