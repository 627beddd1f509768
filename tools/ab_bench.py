"""A/B bench control: same queries, two checkouts, one box, one hour.

The BOX-VARIANCE NOTE in bench.py documents why a broad many-row move
in BENCH_r{N}.json cannot be read as a code regression on its own:
the sandbox VM's effective speed shifts between rounds by more than
the per-row noise band (round 13 measured a median ×1.15 per-row
drift on an idle box whose A/B control showed code parity). This tool
mechanizes that control: it checks the PRIOR round's commit out into
a temp worktree and alternates SPARK_GRAFT_ONLY fresh-JVM subset runs
between the two checkouts — interleaved in time, so both sides sample
the same box conditions — then reports per-query medians and the
current/base ratio. Only a delta that survives this control is code.

Usage:
    python tools/ab_bench.py --base <commit> --queries q1,q2 [--runs 2]
                             [--sf-dir /root/testdata/sf0.1]

Exit: prints one JSON line {"queries": {name: {"base": s, "head": s,
"ratio": r}}, "verdict": {...}}; ratio > 1.3 on a query is flagged
"code?" (investigate), otherwise "box/noise".
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _only_run(checkout: str, names: list[str], sf_dir: str) -> dict[str, float]:
    """One SPARK_GRAFT_ONLY subset run (fresh JVM) at `checkout`."""
    env = dict(os.environ)
    env["SPARK_GRAFT_ONLY"] = ",".join(names)
    env["SPARK_GRAFT_SF_DIR"] = sf_dir
    out = subprocess.run(
        [sys.executable, os.path.join(checkout, "bench.py")],
        cwd=checkout,
        env=env,
        capture_output=True,
        text=True,
        timeout=3600,
    )
    secs: dict[str, float] = {}
    for line in out.stdout.splitlines():
        line = line.strip()
        if line.startswith("{"):
            try:
                row = json.loads(line)
            except json.JSONDecodeError:
                continue
            if "query" in row and "sec" in row:
                secs[row["query"]] = float(row["sec"])
    missing = [n for n in names if n not in secs]
    if missing:
        raise SystemExit(
            f"run at {checkout} reported no sec for {missing}; stderr tail:\n"
            + "\n".join(out.stderr.splitlines()[-5:])
        )
    return secs


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--base", required=True, help="commit of the prior round")
    ap.add_argument("--queries", required=True, help="comma-separated names")
    ap.add_argument("--runs", type=int, default=2, help="runs PER SIDE")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    args = ap.parse_args()
    names = [n.strip() for n in args.queries.split(",") if n.strip()]

    wt = tempfile.mkdtemp(prefix="ab_base_")
    subprocess.run(
        ["git", "worktree", "add", "--force", wt, args.base],
        cwd=REPO,
        check=True,
        capture_output=True,
    )
    try:
        base_runs: list[dict[str, float]] = []
        head_runs: list[dict[str, float]] = []
        # Interleave head/base so both sides sample the same box window;
        # alternate which side goes first to cancel slow-start drift.
        for i in range(args.runs):
            order = (
                [("head", REPO), ("base", wt)]
                if i % 2 == 0
                else [("base", wt), ("head", REPO)]
            )
            for side, checkout in order:
                secs = _only_run(checkout, names, args.sf_dir)
                (head_runs if side == "head" else base_runs).append(secs)
                print(
                    f"[ab] {side} run {i + 1}/{args.runs}: "
                    + ", ".join(f"{n}={secs[n]:.2f}s" for n in names),
                    file=sys.stderr,
                )
        report = {}
        verdict = {}
        for n in names:
            b = statistics.median(r[n] for r in base_runs)
            h = statistics.median(r[n] for r in head_runs)
            b_min = min(r[n] for r in base_runs)
            h_min = min(r[n] for r in head_runs)
            ratio = round(h / b, 3) if b > 0 else None
            ratio_min = round(h_min / b_min, 3) if b_min > 0 else None
            report[n] = {
                "base": b,
                "head": h,
                "ratio": ratio,
                "base_min": b_min,
                "head_min": h_min,
                "ratio_min": ratio_min,
            }
            # Per-run jitter on this box reaches ±40%, so a median ratio
            # alone false-positives (round-13 calibration: agg_spearman
            # read 1.36 then 0.91 across two 4-run sessions). The
            # min-of-runs is the steadier JVM-bench statistic — flag
            # code only when BOTH agree the head is slower.
            code = (
                ratio is not None
                and ratio > 1.3
                and ratio_min is not None
                and ratio_min > 1.3
            )
            verdict[n] = "code?" if code else "box/noise"
        print(json.dumps({"queries": report, "verdict": verdict}))
    finally:
        subprocess.run(
            ["git", "worktree", "remove", "--force", wt],
            cwd=REPO,
            capture_output=True,
        )


if __name__ == "__main__":
    main()
