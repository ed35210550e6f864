"""Value-recoding helpers.

The reference recodes ProvinceID -> province abbreviation with a pandas
`.map({...})` (SANEF_Uploader.py:226, :281, :348), whose unmatched-key
semantics are NaN. The Spark equivalent is a MapType literal lookup, whose
unmatched-key semantics are NULL — same observable behavior (SURVEY.md §2.3
E4). For large mapping tables prefer a broadcast-joined lookup DataFrame;
for literal dicts this stays entirely inside whole-stage codegen.
"""

from __future__ import annotations

from typing import Mapping

from pyspark.sql import Column
from pyspark.sql import functions as F


def recode_map(c: Column | str, mapping: Mapping[object, object]) -> Column:
    """`mapping[c]`, NULL when the key is absent (pandas `.map` parity)."""
    col = F.col(c) if isinstance(c, str) else c
    pairs = [F.lit(x) for kv in mapping.items() for x in kv]
    return F.create_map(*pairs)[col]
