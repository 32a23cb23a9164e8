"""CDC-apply core: envelope parse -> dedup-latest -> split -> merge.

Re-expresses the reference's single data-processing program
(/root/reference/src/main/python/spark_sql_merge_into_iceberg.py) as
composable DataFrame transforms. See SURVEY.md §2 for the operator map.
"""

from .envelope import CDC_ENVELOPE_SCHEMA, flatten_envelope, read_envelope_json
from .dedup import latest_per_key
from .apply import apply_cdc_batch, split_upserts_deletes

__all__ = [
    "CDC_ENVELOPE_SCHEMA",
    "flatten_envelope",
    "read_envelope_json",
    "latest_per_key",
    "split_upserts_deletes",
    "apply_cdc_batch",
]
