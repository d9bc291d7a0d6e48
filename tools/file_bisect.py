"""File-level bisect: base tree (a commit) + selected HEAD files
copied in, one variant per combination, interleaved rounds.

    python tools/file_bisect.py <queries> <baseline> <variants> [rounds]

variants: semicolon-separated lists of repo-relative files to copy
from HEAD over the base worktree ('' = pure base, 'HEAD' = head tree).
"""
from __future__ import annotations

import json
import os
import shutil
import statistics
import subprocess
import sys
import tempfile


def main() -> None:
    names, baseline, variants_raw = sys.argv[1], sys.argv[2], sys.argv[3]
    rounds = int(sys.argv[4]) if len(sys.argv) > 4 else 3
    variants = variants_raw.split(";")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    child = os.path.join(repo, "tools", "_ab_child.py")

    trees: dict[str, str] = {}
    for v in variants:
        if v == "HEAD":
            trees[v] = repo
            continue
        wt = tempfile.mkdtemp(prefix=f"fb_{abs(hash(v)) % 10000}_")
        subprocess.run(
            ["git", "-C", repo, "worktree", "add", "--detach", wt, baseline],
            check=True, capture_output=True, text=True,
        )
        for f in filter(None, v.split(",")):
            shutil.copy2(os.path.join(repo, f), os.path.join(wt, f))
        trees[v] = wt

    obs: dict[str, dict[str, list[float]]] = {}
    try:
        for r in range(rounds):
            order = list(variants)
            if r % 2:
                order.reverse()
            for v in order:
                env = dict(os.environ, PYTHONPATH=trees[v])
                proc = subprocess.run(
                    [sys.executable, child, names], env=env,
                    capture_output=True, text=True, timeout=3600,
                )
                if proc.returncode != 0:
                    print(proc.stderr[-3000:], file=sys.stderr)
                    raise RuntimeError(f"child failed for {v!r}")
                t = json.loads(proc.stdout.strip().splitlines()[-1])
                for n, w in t.items():
                    obs.setdefault(n, {}).setdefault(v, []).append(w)
                print(f"# round {r} [{v or 'base'}]: " + " ".join(
                    f"{n}={w:.2f}" for n, w in t.items()), file=sys.stderr)
        print(json.dumps({
            n: {v or "base": {
                "median": round(statistics.median(xs), 3), "runs": xs}
                for v, xs in by.items()}
            for n, by in obs.items()
        }, indent=1))
    finally:
        for v, wt in trees.items():
            if wt != repo:
                subprocess.run(
                    ["git", "-C", repo, "worktree", "remove", "--force", wt],
                    capture_output=True,
                )


if __name__ == "__main__":
    main()
