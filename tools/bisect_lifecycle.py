"""Interleave _bisect_child.py variants to attribute the r12
lifecycle regression to a specific change. Usage:

    python tools/bisect_lifecycle.py q1,q2 none,size,list [rounds]
"""
from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys


def main() -> None:
    names = sys.argv[1]
    variants = sys.argv[2].split(";")
    rounds = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    child = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "_bisect_child.py")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    obs: dict[str, dict[str, list[float]]] = {}
    for r in range(rounds):
        order = list(variants)
        if r % 2:
            order.reverse()
        for v in order:
            env = dict(os.environ, TOGGLE=v, PYTHONPATH=repo)
            proc = subprocess.run(
                [sys.executable, child, names], env=env,
                capture_output=True, text=True, timeout=3600,
            )
            if proc.returncode != 0:
                print(proc.stderr[-3000:], file=sys.stderr)
                raise RuntimeError(f"child failed for {v}")
            t = json.loads(proc.stdout.strip().splitlines()[-1])
            for n, w in t.items():
                obs.setdefault(n, {}).setdefault(v, []).append(w)
            print(f"# round {r} {v}: " + " ".join(
                f"{n}={w:.2f}" for n, w in t.items()), file=sys.stderr)
    print(json.dumps({
        n: {v: {"median": round(statistics.median(xs), 3), "runs": xs}
            for v, xs in by.items()}
        for n, by in obs.items()
    }, indent=1))


if __name__ == "__main__":
    main()
