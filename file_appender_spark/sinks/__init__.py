from file_appender_spark.sinks.append_text import append_text, append_text_fast

__all__ = ["append_text", "append_text_fast"]
