"""Interleaved A/B of registry queries between HEAD and a baseline
commit (r12 verdict item 2: acquit or convict the orders_* driver
"regressions" with old-vs-new measured in the same minutes).

Usage:
    python tools/ab_queries.py q1,q2 --baseline <commit> [--rounds N]
        [--sf DIR]

Each round runs BOTH variants back-to-back in alternating order
(HEAD-first on even rounds, baseline-first on odd) so host noise
bands hit both sides equally; every pass is a fresh process (own
JVM) running ``tools/_ab_child.py`` with PYTHONPATH pointed at the
variant's tree. Prints per-round walls and a median table; never
touches BENCH_LOCK.json.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import tempfile


def _run_child(repo: str, names: list[str], sf_dir: str) -> dict[str, float]:
    env = dict(os.environ)
    env["PYTHONPATH"] = repo
    env["SPARK_GRAFT_SF_DIR"] = sf_dir
    child = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "_ab_child.py"
    )
    proc = subprocess.run(
        [sys.executable, child, ",".join(names)],
        env=env, capture_output=True, text=True, timeout=3600,
    )
    if proc.returncode != 0:
        print(proc.stderr[-2000:], file=sys.stderr)
        raise RuntimeError(f"child failed in {repo}")
    return json.loads(proc.stdout.strip().splitlines()[-1])


def main() -> None:
    argv = sys.argv[1:]
    names = [n for n in argv[0].split(",") if n]
    commit = argv[argv.index("--baseline") + 1]
    rounds = int(argv[argv.index("--rounds") + 1]) if "--rounds" in argv else 5
    sf_dir = "/root/testdata/sf0.1"
    if "--sf" in argv:
        sf_dir = argv[argv.index("--sf") + 1]
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    wt = tempfile.mkdtemp(prefix="ab_queries_")
    subprocess.run(
        ["git", "-C", repo, "worktree", "add", "--detach", wt, commit],
        check=True, capture_output=True, text=True,
    )
    try:
        obs: dict[str, dict[str, list[float]]] = {
            n: {"head": [], "base": []} for n in names
        }
        for r in range(rounds):
            order = [("head", repo), ("base", wt)]
            if r % 2:
                order.reverse()
            for tag, tree in order:
                t = _run_child(tree, names, sf_dir)
                for n, w in t.items():
                    obs[n][tag].append(w)
                print(f"# round {r} {tag}: " + " ".join(
                    f"{n}={w:.2f}" for n, w in t.items()), file=sys.stderr)
        print(json.dumps({
            n: {
                "head_median": round(statistics.median(v["head"]), 3),
                "base_median": round(statistics.median(v["base"]), 3),
                "head_runs": [round(x, 3) for x in v["head"]],
                "base_runs": [round(x, 3) for x in v["base"]],
            }
            for n, v in obs.items()
        }, indent=1))
    finally:
        subprocess.run(["git", "-C", repo, "worktree", "remove", "--force", wt],
                       capture_output=True)


if __name__ == "__main__":
    main()
