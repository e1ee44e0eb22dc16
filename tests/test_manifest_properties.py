"""Property-based tests for the manifest-log lifecycle
(operators/manifestfs.py) — pure metadata, no Spark in the loop, so
hypothesis can drive hundreds of randomized op sequences.

A reference MODEL tracks, per committed version, the true live set
and per-version add/remove delta, which manifest files vacuum's
keep-window semantics should retain, and what the newest checkpoint
summarized. After every random sequence of
commit / compact-commit / checkpoint / vacuum ops:

- the head read equals the model's last commit exactly;
- every generation the head references still exists on disk
  (vacuum can NEVER reclaim live data);
- time travel to any retained version returns that exact manifest,
  and to any reclaimed version raises with the retention hint;
- history() equals the model's expectation: true per-version entries
  for everything a checkpoint summarized while its file was present,
  gap-collapsed diffs where files were vacuumed un-checkpointed.
"""

import os
import shutil

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from auto_data_linkage_spark.operators import manifestfs as M

ops = st.lists(
    st.one_of(
        st.just(("add",)),
        st.just(("compact",)),
        st.just(("checkpoint",)),
        st.tuples(st.just("vacuum"), st.integers(min_value=1, max_value=4)),
    ),
    min_size=1,
    max_size=24,
)


def _entry(prev: set, cur: set, version: int, op: str) -> dict:
    return {
        "version": version,
        "op": op,
        "added": {"t": sorted(cur - prev)} if cur - prev else {},
        "removed": {"t": sorted(prev - cur)} if prev - cur else {},
    }


@given(ops)
@settings(
    max_examples=60,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
def test_manifest_log_lifecycle_invariants(tmp_path_factory, seq):
    root = str(tmp_path_factory.mktemp("mstore"))
    M.init_manifest_store(root, tables={}, meta={"i": 0}, op="build")

    # ---- reference model ----
    live: set = set()          # current live gen set of table "t"
    version = 1
    commits = {1: (set(), "build")}   # version -> (live set AFTER, op)
    present = {1}              # versions whose manifest file remains
    gen_seq = 0
    # newest checkpoint: (upto, entries list, state set) or None
    chk = None

    def mkgen():
        nonlocal gen_seq
        gen_seq += 1
        g = f"gen={gen_seq}xaaaa{gen_seq:04d}"
        d = os.path.join(root, "t", g)
        os.makedirs(d)
        open(os.path.join(d, "p.parquet"), "w").write("x")
        return g

    for op in seq:
        if op[0] == "add":
            g = mkgen()
            live = live | {g}
            version += 1
            M.commit_manifest(
                root, tables={"t": {"": sorted(live)}}, meta={"i": version},
                expected_version=version - 1, op="append",
            )
            commits[version] = (set(live), "append")
            present.add(version)
        elif op[0] == "compact":
            g = mkgen()
            live = {g}
            version += 1
            M.commit_manifest(
                root, tables={"t": {"": sorted(live)}}, meta={"i": version},
                expected_version=version - 1, op="compact",
            )
            commits[version] = (set(live), "compact")
            present.add(version)
        elif op[0] == "checkpoint":
            M.checkpoint_manifest_log(root)
            # model: entries of the previous checkpoint + diff-walk over
            # PRESENT versions newer than its upto
            p_upto = chk[0] if chk else 0
            entries = list(chk[1]) if chk else []
            state = set(chk[2]) if chk else set()
            for v in sorted(present):
                if v <= p_upto:
                    continue
                cur, opname = commits[v]
                entries.append(_entry(state, cur, v, opname))
                state = cur
            chk = (version, entries, state)
        else:  # vacuum
            keep = op[1]
            M.vacuum(root, keep_manifests=keep, min_age_seconds=0)
            kept = sorted(present)[-keep:]
            present = set(kept)

        # ---- invariants after EVERY op ----
        head = M.read_manifest(root)
        assert head["version"] == version
        assert set(head["tables"].get("t", {}).get("", [])) == live
        # live data can never be reclaimed
        for g in live:
            assert os.path.isdir(os.path.join(root, "t", g)), g

    # retained versions time-travel exactly; reclaimed raise with hint
    for v, (vl, _op) in commits.items():
        if v in present:
            m = M.read_manifest(root, version=v)
            assert set(m["tables"].get("t", {}).get("", [])) == vl
        else:
            try:
                M.read_manifest(root, version=v)
            except FileNotFoundError as e:
                assert "vacuum" in str(e)
            else:
                raise AssertionError(f"reclaimed v{v} still readable")

    # history == checkpointed entries + diff-walk over present > upto
    p_upto = chk[0] if chk else 0
    expected = list(chk[1]) if chk else []
    state = set(chk[2]) if chk else set()
    for v in sorted(present):
        if v <= p_upto:
            continue
        cur, opname = commits[v]
        expected.append(_entry(state, cur, v, opname))
        state = cur
    assert M.history(root) == expected

    shutil.rmtree(root, ignore_errors=True)
