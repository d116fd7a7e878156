"""Input-size linearity evidence: throughput vs data volume.

The 2->8-core experiment (bench_scaling.py) shows the job scales with
CORES; this one shows it scales with DATA — the same job at a FIXED
parallelism over geometrically growing inputs, reporting pages/sec at
each size. A flat curve means no super-linear term hides in the
pipeline (no accumulating driver state, no quadratic join, no
partition-count cliff): the property that lets the measured
small-scale throughput be multiplied out to the 10^12-document target.

Protocol reuses bench_scaling.py's measured child verbatim (pinned
cores, untimed warm pass, best of OPHOIS_SCALE_PASSES steady-state
passes, one union'd action per phase) — only the input size varies.
Sizes are 3x steps (OPHOIS_LIN_SIZES), level OPHOIS_LIN_CPUS (default
16: large enough to be the "cluster" regime, small enough to dodge the
full-box host-interference noise documented in BENCH/BASELINE.md).

Writes/updates the "## Input-size linearity" section of
BENCH/BASELINE.md; one JSON line on stdout.
"""

from __future__ import annotations

import json
import os
import re
import shutil
import subprocess
import sys
import tempfile

HERE = os.path.dirname(os.path.abspath(__file__))
SIZES = [int(x) for x in os.environ.get("OPHOIS_LIN_SIZES", "8000,24000,72000").split(",")]
CPUS = int(os.environ.get("OPHOIS_LIN_CPUS", "16"))
MD_PATH = os.path.join(HERE, "BENCH", "BASELINE.md")
MD_HEADER = "## Input-size linearity"


def _run(args: list[str], pin: bool, extra_env: dict | None = None) -> dict:
    cmd = ["taskset", "-c", ",".join(str(i) for i in range(CPUS))] if pin else []
    env = dict(os.environ, **(extra_env or {}))
    out = subprocess.run(
        [*cmd, sys.executable, os.path.join(HERE, "bench_scaling.py"), *args],
        capture_output=True, text=True, check=True, cwd=HERE, env=env,
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> int:
    work = tempfile.mkdtemp(prefix="ophois_linearity_")
    rows = []
    try:
        for n_pages in SIZES:
            input_dir = os.path.join(work, f"pages_{n_pages}")
            _run(["--generate", "--input", input_dir], pin=False,
                 extra_env={"OPHOIS_SCALE_PAGES": str(n_pages)})
            r = _run(["--child", "--cpus", str(CPUS), "--input", input_dir], pin=True)
            r["n_pages"] = n_pages
            r["pages_per_sec"] = round(n_pages / r["t_total_s"], 1)
            r["edges_per_sec"] = round(r["n_edges"] / r["t_total_s"], 1)
            rows.append(r)
            shutil.rmtree(input_dir, ignore_errors=True)
    finally:
        shutil.rmtree(work, ignore_errors=True)

    base = rows[0]["pages_per_sec"]
    table = "\n".join(
        f"| {r['n_pages']} | {r['t_ingest_s']} | {r['t_tiling_s']} | {r['t_total_s']} "
        f"| {r['pages_per_sec']} | {round(r['pages_per_sec'] / base, 3)} |"
        for r in rows
    )
    worst = min(r["pages_per_sec"] / base for r in rows)
    section = f"""{MD_HEADER}

Same job, same `local[{CPUS}]` (taskset-pinned), same per-child
protocol as the core-scaling experiment — only the INPUT grows in 3x
steps. Flat pages/sec across a {SIZES[-1] // SIZES[0]}x volume range
means no super-linear term (accumulating driver state, quadratic join,
partition cliff) hides in the pipeline, which is what licenses
extrapolating the measured throughput toward the 10^12-document
target. Reproduce: `python bench_linearity.py`.

| pages | ingest s | tiling s | total s | pages/s | vs smallest |
|---|---|---|---|---|---|
{table}

- worst-case throughput retention across sizes: **{worst:.3f}x** of the
  smallest input's rate (1.0 = perfectly input-linear).
"""
    md = open(MD_PATH).read()
    if MD_HEADER in md:
        md = re.compile(re.escape(MD_HEADER) + r".*?(?=\n## |\Z)", re.DOTALL).sub(
            section.rstrip() + "\n", md
        )
    else:
        md = md.rstrip() + "\n\n" + section
    with open(MD_PATH, "w") as f:
        f.write(md)
    print(json.dumps({"cpus": CPUS, "rows": rows, "worst_retention": round(worst, 3)}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
