"""Randomized branch / write-audit-publish soak (r6).

Interleaves keyed merges on MAIN and on a fork BRANCH with tag
creation, rollback, publish (fast-forward), and diverge-then-refork —
checked against a driver-side model of both refs' states. The WAP
rules pinned: branch commits never leak into main until publish,
publish requires main unchanged since the fork (else
BranchDivergedError and the branch re-forks), tags stay pinned
through everything, rollback commits on top (history preserved).
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from transactional_datalake_using_apache_iceberg_on_aws_glue_spark.lake import (
    ParquetLakeTable,
)
from transactional_datalake_using_apache_iceberg_on_aws_glue_spark.lake.table import (
    BranchDivergedError,
)

R = "trans_id long, event string, amount int"


def _apply(state: dict, ops: list) -> None:
    for k, ev, a, op in ops:
        if op == "delete":
            state.pop(k, None)
        else:
            state[k] = (ev, a)


def _read(t) -> dict:
    return {r["trans_id"]: (r["event"], r["amount"])
            for r in t.read_data().collect()}


@pytest.mark.parametrize("seed", [7])
def test_branch_wap_random_soak(spark, tmp_path, seed):
    rng = random.Random(seed)
    t = ParquetLakeTable(spark, str(tmp_path / "wap"),
                         key_cols=["trans_id"], partition_col="event")
    t.create(spark.createDataFrame(
        [(k, "a" if k % 2 else "b", k * 10) for k in range(1, 5)], R))
    main_state = {k: ("a" if k % 2 else "b", k * 10) for k in range(1, 5)}

    branch = None          # (handle, state, fork_main_version)
    tags: dict[str, dict] = {}
    n_branch = 0
    hits = {"publish": 0, "diverged": 0, "rollback": 0}

    def wave(handle, state):
        ops = []
        for k in rng.sample(range(1, 15), rng.randrange(1, 4)):
            op = rng.choice(["insert", "update", "delete"])
            ops.append((k, rng.choice(["a", "b", "c"]), rng.randrange(100),
                        op))
        df = spark.createDataFrame([(k, e, a) for k, e, a, _ in ops], R)
        opc = F.coalesce(*[F.when(F.col("trans_id") == k, F.lit(o))
                           for k, _, _, o in ops], F.lit("insert"))
        handle.merge(df.withColumn("_op", opc))
        _apply(state, ops)

    for i in range(40):
        roll = rng.random()
        if roll < 0.35:
            wave(t, main_state)
        elif roll < 0.55 and branch is not None:
            wave(branch[0], branch[1])
        elif roll < 0.65 and branch is None:
            name = f"wap{n_branch}"
            n_branch += 1
            t.create_branch(name)
            branch = (t.branch(name), dict(main_state),
                      t.current_version(), name)
        elif roll < 0.75 and branch is not None:
            b, b_state, fork_v, name = branch
            if t.current_version() != fork_v:
                # main advanced since the fork: publish must refuse
                with pytest.raises(BranchDivergedError):
                    t.publish_branch(name)
                t.drop_branch(name)
                hits["diverged"] += 1
            else:
                t.publish_branch(name)
                main_state = dict(b_state)
                hits["publish"] += 1
            branch = None
        elif roll < 0.85:
            tag = f"tag{i}"
            t.tag(tag)
            tags[tag] = dict(main_state)
        elif roll < 0.92 and t.current_version() > 1:
            # rollback main one lineage step (commits on top)
            lineage = sorted(t._ancestors(t.current_version()))
            if len(lineage) >= 2:
                prev = lineage[-2]
                snap = {r["trans_id"]: (r["event"], r["amount"])
                        for r in t.read_data(as_of_version=prev).collect()}
                t.rollback(prev)
                main_state = snap
                hits["rollback"] += 1
        # invariants every few steps
        if i % 5 == 4:
            assert _read(t) == main_state, f"main diverged at step {i}"
            if branch is not None:
                assert _read(branch[0]) == branch[1], (
                    f"branch diverged at step {i}")
    # final: every tag still reads its pinned state
    for tag, snap in tags.items():
        head = t._ref_heads().get(f"tag-{tag}")
        got = {r["trans_id"]: (r["event"], r["amount"])
               for r in t.read_data(as_of_version=head).collect()}
        assert got == snap, f"tag {tag} drifted"
    assert _read(t) == main_state
    # the seed must actually exercise the interesting paths
    assert tags and hits["publish"] and hits["diverged"] and hits["rollback"], (
        tags.keys(), hits)
