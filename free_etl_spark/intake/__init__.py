"""Reference-parity intake engine (SURVEY.md §2A).

Reproduces the validate→normalize→sink pipeline of the reference
(/root/reference/streamlit_app.py) with two code paths sharing one
semantic spec:

- parity path (validate.py): driver-side, byte-exact with the
  reference for files bounded by the max-size guard (≤50 MB default).
- scale path (spark_intake.py): the same semantics as Spark jobs —
  FAILFAST CSV parse, ""-not-NULL normalization, distributed write —
  for inputs far beyond the reference's single-node bound.
"""

from free_etl_spark.intake.config import AppConfig, load_cfg  # noqa: F401
from free_etl_spark.intake.validate import FileCheck, validate_and_normalize  # noqa: F401
