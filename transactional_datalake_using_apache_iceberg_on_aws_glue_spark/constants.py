"""Shared column-name constants (imported by both ``cdc`` and ``lake``
without creating a package cycle)."""

#: Merge/primary key of the reference's target table (README.md:85,103).
PRIMARY_KEY = "trans_id"

#: Transient CDC op columns carried through dedup/split, persisted as
#: lineage when the table stores them (late-data guard).
OP_COL = "_op"
OP_TS_COL = "_op_timestamp"
TXN_COL = "_txn_id"
