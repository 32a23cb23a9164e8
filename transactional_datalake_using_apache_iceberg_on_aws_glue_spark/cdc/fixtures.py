"""Golden CDC test vectors.

Programmatic reconstruction of the reference's hardcoded replay lists
(/root/reference/src/utils/gen_fake_cdc_data.py:26-59; semantics
documented in FIXTURES.md §A1): 10 inserts, then a DML wave of
5 updates / 3 deletes / 5 inserts. After applying both waves the table
must hold exactly 12 rows, keys {6,23,33} absent, and the updated
amounts visible (19->39, 21->60, 24->42, 30->67, 35->85).

Values are generated, not copied — only the key structure and expected
final state (the test contract) match the reference.
"""

from __future__ import annotations

import json
from typing import Iterator

_EVENTS = ["visit", "view", "cart", "list", "like", "purchase"]
_DEVICES = ["pc", "mobile", "tablet"]

INSERT_KEYS = [6, 19, 21, 23, 24, 27, 28, 30, 33, 35]
UPDATE_AMOUNTS = {19: 39, 21: 60, 24: 42, 30: 67, 35: 85}
DELETE_KEYS = [6, 33, 23]
DML_INSERT_KEYS = [37, 38, 41, 43, 47]

def _row(trans_id: int, amount: int) -> dict:
    i = trans_id
    return {
        "trans_id": trans_id,
        "customer_id": f"{100000000000 + i:012d}",
        "event": _EVENTS[i % len(_EVENTS)],
        "sku": f"AB%{i:03d}CDEF",
        "amount": amount,
        "device": _DEVICES[i % len(_DEVICES)],
        "trans_datetime": f"2023-01-{(i % 27) + 1:02d}T10:00:00Z",
    }


def _envelope(row: dict, op: str, seq: int) -> dict:
    return {
        "data": row,
        "metadata": {
            "timestamp": f"2023-02-01T00:00:{seq // 60:02d}.{(seq % 60) * 1000 + 500:06d}",
            "record-type": "data",
            "operation": op,
            "partition-key-type": "primary-key",
            "schema-name": "testdb",
            "table-name": "retail_trans",
            "transaction-id": 1000 + seq,
        },
    }


def insert_only_envelopes() -> list[dict]:
    """Wave 1: 10 inserts (reference insert_only_cdc_list)."""
    return [_envelope(_row(k, amount=10 + k), "insert", seq) for seq, k in enumerate(INSERT_KEYS)]


def dml_envelopes() -> list[dict]:
    """Wave 2: 5 updates, 3 deletes, 5 inserts (reference dml_cdc_list)."""
    out = []
    seq = 100
    for k, amt in UPDATE_AMOUNTS.items():
        out.append(_envelope(_row(k, amount=amt), "update", seq))
        seq += 1
    for k in DELETE_KEYS:
        out.append(_envelope(_row(k, amount=10 + k), "delete", seq))
        seq += 1
    for k in DML_INSERT_KEYS:
        out.append(_envelope(_row(k, amount=20 + k), "insert", seq))
        seq += 1
    return out


def expected_final_state() -> dict[int, int]:
    """trans_id -> amount after both waves (12 rows)."""
    state: dict[int, int] = {k: 10 + k for k in INSERT_KEYS}
    state.update(UPDATE_AMOUNTS)
    for k in DELETE_KEYS:
        state.pop(k)
    for k in DML_INSERT_KEYS:
        state[k] = 20 + k
    return state


def write_jsonl(envelopes: list[dict], path: str) -> None:
    with open(path, "w") as f:
        for e in envelopes:
            f.write(json.dumps(e) + "\n")


def iter_all_waves() -> Iterator[list[dict]]:
    yield insert_only_envelopes()
    yield dml_envelopes()
