"""Identity-bearing appends rebase on commit conflict instead of
re-running the data job (AcidTable._append_with_identity).

Pre-r10, a lost commit race by an identity append re-executed the
caller's whole upstream plan (staging from scratch against the
winner's watermark). Now the staged files rebase: a winner that left
the identity watermark alone (compact, delete, metadata) costs ZERO
extra work — the staged files commit unchanged at the new version;
a winner that minted ids past ours (concurrent identity append)
costs one constant-shift re-stamp of the already-materialized staged
batch, never a re-execution of the upstream plan. A winner that
REWOUND the watermark (restore) falls back to the full re-stage —
the only sound answer against a rewound id space.
"""

from __future__ import annotations

import threading

import pytest

from data_lake_demo_spark.tableformat import AcidTable


def _inject_winner_once(t, winner_fn):
    """Patch t so the FIRST _try_commit attempt loses to winner_fn."""
    real = t._try_commit
    state = {"fired": False}

    def patched(version, *a, **k):
        if not state["fired"]:
            state["fired"] = True
            winner_fn()
        return real(version, *a, **k)

    t._try_commit = patched


def _count_staging(t):
    real = t._stage_actions
    counter = {"n": 0}

    def patched(*a, **k):
        counter["n"] += 1
        return real(*a, **k)

    t._stage_actions = patched
    return counter


def _tracked_df(spark, tmp_path, rows):
    """A DataFrame whose PLAN execution is observable: every run of
    the upstream pipeline appends one line to a marker file (one
    partition, so one line per execution). Distinguishes 'plan
    re-ran' from 'staged parquet re-read' — the thing the rebase is
    supposed to avoid."""
    marker = str(tmp_path / "plan_runs.log")

    def fn(it):
        with open(marker, "a") as f:
            f.write("run\n")
        yield from it

    df = (
        spark.createDataFrame([(r,) for r in rows], "s string")
        .coalesce(1)
        .mapInPandas(fn, "s string")
    )
    return df, marker


def _runs(marker):
    try:
        with open(marker) as f:
            return len(f.readlines())
    except FileNotFoundError:
        return 0


def _identity_table(spark, path, start=100):
    t = AcidTable(spark, path)
    t.append(
        spark.createDataFrame(
            [(-2, "seed1"), (-1, "seed2")], "id long, s string"
        ).coalesce(1)
    )
    t.set_identity_column("id", start=start)
    return t


def test_identity_append_rebases_over_identity_append(spark, tmp_path):
    """The watermark-advanced case: the winner minted ids past ours,
    so the staged files get a constant-shift re-stamp — ONE upstream
    plan execution, ids unique and contiguous-per-batch, watermark
    monotone past both batches."""
    path = str(tmp_path / "t")
    t = _identity_table(spark, path, start=100)
    w = AcidTable(spark, path)
    df, marker = _tracked_df(spark, tmp_path, ["l1", "l2", "l3"])
    _inject_winner_once(
        t,
        lambda: w.append(
            spark.createDataFrame([("w1",), ("w2",)], "s string").coalesce(1)
        ),
    )
    t.append(df)
    assert _runs(marker) == 1  # upstream plan ran ONCE
    got = {r["s"]: r["id"] for r in t.snapshot().collect()}
    ids = [v for k, v in got.items() if k.startswith(("w", "l"))]
    assert len(ids) == len(set(ids)) == 5  # no double-allocation
    assert {got["w1"], got["w2"]} == {100, 101}  # winner kept its ids
    assert {got["l1"], got["l2"], got["l3"]} == {102, 103, 104}  # shifted
    # watermark provably covers everything written
    assert t.properties()["identity.id"]["next"] == 105


def test_identity_append_rebases_over_compact_zero_cost(spark, tmp_path):
    """The watermark-untouched case (OPTIMIZE racing an identity
    INSERT): the staged files commit unchanged — no second staging,
    no plan re-run, original ids kept."""
    path = str(tmp_path / "t")
    t = _identity_table(spark, path, start=100)
    t.append(spark.createDataFrame([("a",), ("b",)], "s string").coalesce(1))
    w = AcidTable(spark, path)
    df, marker = _tracked_df(spark, tmp_path, ["l1", "l2"])
    n = _count_staging(t)
    _inject_winner_once(t, lambda: w.compact(n_files=1))
    t.append(df)
    assert _runs(marker) == 1  # plan ran once
    assert n["n"] == 1  # and staging happened once: pure rebase
    got = {r["s"]: r["id"] for r in t.snapshot().collect()}
    assert {got["l1"], got["l2"]} == {102, 103}  # ids as originally minted
    assert t.properties()["identity.id"]["next"] == 104


def test_identity_append_restaged_after_watermark_rewind(spark, tmp_path):
    """RESTORE rolls the identity watermark back (unlike row-tracking,
    which has an explicit no-rollback carve-out) — the constant shift
    would re-mint ids below already-staged ones, so the loser falls
    back to a full re-stage against the restored state."""
    path = str(tmp_path / "t")
    t = _identity_table(spark, path, start=100)
    v_before = t.latest_version()
    t.append(spark.createDataFrame([("a",), ("b",)], "s string").coalesce(1))
    w = AcidTable(spark, path)
    df, marker = _tracked_df(spark, tmp_path, ["l1", "l2"])
    _inject_winner_once(t, lambda: w.restore(v_before))
    t.append(df)
    assert _runs(marker) == 2  # rewind forces the full re-stage
    got = {r["s"]: r["id"] for r in t.snapshot().collect()}
    # a/b were restored away; the batch re-minted from the rewound mark
    assert set(got) == {"seed1", "seed2", "l1", "l2"}
    assert {got["l1"], got["l2"]} == {100, 101}
    ids = list(got.values())
    assert len(ids) == len(set(ids))
    assert t.properties()["identity.id"]["next"] == 102


def test_identity_append_txn_replay_rechecked_on_rebase(spark, tmp_path):
    """A concurrent replay of the same (app, batch_id) landing
    mid-race turns the rebase into an idempotent no-op — never a
    double-apply."""
    path = str(tmp_path / "t")
    t = _identity_table(spark, path, start=100)
    w = AcidTable(spark, path)
    batch = spark.createDataFrame([("x",), ("y",)], "s string").coalesce(1)
    _inject_winner_once(t, lambda: w.append(batch, txn=("app", 7)))
    t.append(batch, txn=("app", 7))
    rows = t.snapshot().collect()
    assert sorted(r["s"] for r in rows if r["s"] in "xy") == ["x", "y"]
    assert len(rows) == 4  # seeds + ONE copy of the batch
    assert t.properties()["identity.id"]["next"] == 102


def test_identity_threaded_appends_stay_unique_and_gapless_watermark(
    spark, tmp_path
):
    """Real-thread race: four identity appends land in some order;
    every id is unique, and the final watermark sits past the max."""
    path = str(tmp_path / "t")
    t = _identity_table(spark, path, start=0)
    errs = []

    def add(tag):
        try:
            AcidTable(spark, path).append(
                spark.createDataFrame(
                    [(f"{tag}{i}",) for i in range(5)], "s string"
                ).coalesce(1),
                max_retries=20,
            )
        except Exception as e:  # pragma: no cover
            errs.append(e)

    th = [threading.Thread(target=add, args=(c,)) for c in "abcd"]
    [x.start() for x in th]
    [x.join() for x in th]
    assert not errs
    rows = t.snapshot().collect()
    ids = [r["id"] for r in rows if r["id"] is not None]
    assert len(ids) == len(set(ids))
    nxt = t.properties()["identity.id"]["next"]
    assert nxt > max(ids)


@pytest.mark.parametrize("seed", [0])
def test_identity_fuzz_races_keep_ids_unique(spark, tmp_path, seed):
    """Randomized identity-append race sequences (the fuzzer
    extension from the r9 verdict): each append races an injected
    winner drawn from {identity append, compact, restore, none};
    after every step ids are globally unique, rows all present (or
    provably restored away), and the watermark strictly covers the
    max live id. Deterministic seed — hypothesis is overkill here
    because the state space is the race TYPE, not the data."""
    import random

    rng = random.Random(seed)
    path = str(tmp_path / "t")
    t = _identity_table(spark, path, start=0)
    w = AcidTable(spark, path)
    expected = {"seed1", "seed2"}
    restorable = [t.latest_version()]
    tag = 0
    for step in range(8):
        race = rng.choice(["id_append", "compact", "restore", "none"])
        tag += 1
        batch = [f"b{tag}_{i}" for i in range(rng.randint(1, 4))]
        if race == "id_append":
            wtag = f"w{tag}"
            wrows = [(f"{wtag}_{i}",) for i in range(2)]
            _inject_winner_once(
                t,
                lambda rows=wrows: w.append(
                    spark.createDataFrame(rows, "s string").coalesce(1)
                ),
            )
            expected.update(s for s, in wrows)
        elif race == "compact":
            _inject_winner_once(t, lambda: w.compact(n_files=1))
        elif race == "restore":
            target = rng.choice(restorable)
            snap_rows = {
                r["s"] for r in t.snapshot(as_of=target).collect()
            }
            _inject_winner_once(t, lambda v=target: w.restore(v))
            expected = snap_rows
        t.append(
            spark.createDataFrame([(s,) for s in batch], "s string")
            .coalesce(1),
            max_retries=20,
        )
        expected.update(batch)
        rows = t.snapshot().collect()
        got = {r["s"] for r in rows}
        assert got == expected, (step, race)
        ids = [r["id"] for r in rows]
        assert len(ids) == len(set(ids)), (step, race)  # never doubled
        nxt = t.properties()["identity.id"]["next"]
        assert nxt > max(ids), (step, race)  # watermark monotone cover
        restorable.append(t.latest_version())
