from hadoop_3_3_6_spark.sources.readers import (
    read_key_value_text,
    read_text_lines,
    sample_filter_md5,
    sample_filter_percent,
    sample_filter_percent_positional,
    sample_filter_regex,
)
from hadoop_3_3_6_spark.sources.writers import multiple_outputs, write_key_value_text
from hadoop_3_3_6_spark.sources.terasort import teragen, terasort, teravalidate

__all__ = [
    "read_key_value_text",
    "read_text_lines",
    "sample_filter_md5",
    "sample_filter_percent",
    "sample_filter_percent_positional",
    "sample_filter_regex",
    "multiple_outputs",
    "write_key_value_text",
    "teragen",
    "terasort",
    "teravalidate",
]
