"""Record IO, ETL, host loading, and the jit preprocessing pipeline."""

from . import example, proto, tfrecord
from .example import SegExample, make_example, parse_example, read_example

__all__ = ["proto", "tfrecord", "example", "SegExample", "make_example",
           "parse_example", "read_example"]
