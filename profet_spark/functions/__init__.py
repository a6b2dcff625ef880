from profet_spark.functions import (
    alphabets,
    image_descriptors,
    sql_registry,
    text_descriptors,
)

__all__ = ["alphabets", "text_descriptors", "image_descriptors", "sql_registry"]
