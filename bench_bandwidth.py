"""Host memory-bandwidth probe: is the scaling ceiling hardware?

The north rule's evidence protocol runs the same Spark job at N and 4N
local cores. That is only meaningful if the host can actually feed 4N
cores: the ingest/tiling job is streaming-memory-bound (parquet decode,
hashing, shuffle spill), so its parallel ceiling is the machine's
aggregate memory bandwidth, not its core count. This probe measures
both sides of that claim:

- **triad**: a STREAM-style streaming kernel (``a = b + c`` over
  arrays far larger than LLC — same 2-read/1-write traffic per element
  as classic triad) in P independent processes, P in {1,2,4,8,16,32}.
  Reported aggregate GB/s counts 24 bytes/element/iteration (read b,
  read c, write a — write-allocate traffic makes the true number
  higher, but the SCALING shape is what matters here).
- **alu**: the control — a compute-bound fused multiply-add loop on an
  L1-resident array. If alu scales ~P while triad flatlines, the
  ceiling is the memory system, not the scheduler, the GIL (each P is
  a separate process), or the engine.

The punchline row for BENCH/BASELINE.md: the bandwidth-implied maximum
2->8 scaling efficiency is ``(BW(8)/BW(2))/4`` — no memory-streaming
job on this host can beat it, whatever its partitioning. Compare the
measured Spark efficiency against that, not against 1.0.

Protocol: all P workers start on a barrier, run a fixed wall-clock
window (default 2 s) after an untimed warm pass, and report iterations
completed; ``OPHOIS_BW_REPS`` (default 3) repetitions per level,
best aggregate kept. One JSON line on stdout; with
``OPHOIS_BW_WRITE_MD=1`` also rewrites the "## Memory-bandwidth probe"
section of BENCH/BASELINE.md (opt-in so ad-hoc partial-ladder probes
cannot clobber the curated section).
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import re
import time

LEVELS = [int(x) for x in os.environ.get("OPHOIS_BW_LEVELS", "1,2,4,8,16,32").split(",")]
REPS = int(os.environ.get("OPHOIS_BW_REPS", "3"))
WINDOW_S = float(os.environ.get("OPHOIS_BW_WINDOW", "2.0"))
TRIAD_N = int(os.environ.get("OPHOIS_BW_N", str(8 * 1024 * 1024)))  # 64 MB/array
ALU_N = 4096  # L1-resident
MD_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH", "BASELINE.md")
MD_HEADER = "## Memory-bandwidth probe"


def _worker(kind: str, barrier, out, idx: int) -> None:
    import numpy as np

    if kind == "triad":
        b = np.random.default_rng(idx).random(TRIAD_N)
        c = np.random.default_rng(idx + 1).random(TRIAD_N)
        a = np.empty_like(b)

        def step():
            np.add(b, c, out=a)  # 2 reads + 1 write, LLC-defeating

    else:
        x = np.random.default_rng(idx).random(ALU_N)
        y = np.empty_like(x)

        def step():
            np.multiply(x, 1.0000001, out=y)
            for _ in range(63):
                np.multiply(y, 1.0000001, out=y)

    step()  # warm: page-in, JIT-free but touches allocator/caches
    barrier.wait()
    t0 = time.perf_counter()
    iters = 0
    while True:
        step()
        iters += 1
        if time.perf_counter() - t0 >= WINDOW_S:
            break
    dt = time.perf_counter() - t0
    out.put((idx, iters, dt))


def run_level(kind: str, procs: int) -> float:
    """Aggregate rate for one level: triad GB/s or alu Gop/s."""
    ctx = mp.get_context("spawn")
    barrier = ctx.Barrier(procs)
    out = ctx.Queue()
    ps = [ctx.Process(target=_worker, args=(kind, barrier, out, i)) for i in range(procs)]
    for p in ps:
        p.start()
    total = 0.0
    for _ in range(procs):
        idx, iters, dt = out.get()
        if kind == "triad":
            total += iters * TRIAD_N * 24 / dt / 1e9  # GB/s
        else:
            total += iters * ALU_N * 64 / dt / 1e9  # G fused ops/s
    for p in ps:
        p.join()
    return round(total, 2)


def write_md(triad: dict, alu: dict) -> None:
    rows = "\n".join(
        f"| {p} | {triad[p]} | {round(triad[p] / triad[LEVELS[0]], 2)}x "
        f"| {alu[p]} | {round(alu[p] / alu[LEVELS[0]], 2)}x |"
        for p in LEVELS
    )
    implied = (triad[8] / triad[2]) / 4 if 8 in triad and 2 in triad else None
    implied_line = (
        f"\n- **bandwidth-implied max 2->8 scaling efficiency: "
        f"{implied:.3f}** — `(BW(8)/BW(2))/4`; no streaming-memory job on "
        "this host (Spark ingest included) can exceed it, regardless of "
        "partitioning. Judge the measured Spark efficiency against this "
        "hardware ceiling, not against 1.0."
        if implied is not None
        else ""
    )
    section = f"""{MD_HEADER}

STREAM-triad (64 MB arrays, 24 B/elem/iter) vs an L1-resident ALU
control, P independent processes started on a barrier, {WINDOW_S:.0f} s
timed window after a warm pass, best of {REPS} reps per level.
Reproduce: `python bench_bandwidth.py`.

| procs | triad GB/s | triad scaling | alu Gop/s | alu scaling |
|---|---|---|---|---|
{rows}
{implied_line}
- The triad curve is the host's aggregate memory bandwidth; where it
  flattens is where ANY shuffle/scan-bound job stops scaling on this
  box. The ALU control isolates that ceiling from scheduler/process
  effects.
"""
    with open(MD_PATH) as f:
        md = f.read()
    if MD_HEADER in md:
        pat = re.compile(re.escape(MD_HEADER) + r".*?(?=\n## |\Z)", re.DOTALL)
        md = pat.sub(section.rstrip() + "\n", md)
    else:
        md = md.rstrip() + "\n\n" + section
    with open(MD_PATH, "w") as f:
        f.write(md)


def main() -> None:
    triad: dict[int, float] = {}
    alu: dict[int, float] = {}
    for _ in range(REPS):
        for p in LEVELS:  # interleave levels within a rep to decorrelate drift
            t = run_level("triad", p)
            triad[p] = max(triad.get(p, 0.0), t)
            a = run_level("alu", p)
            alu[p] = max(alu.get(p, 0.0), a)
    if os.environ.get("OPHOIS_BW_WRITE_MD", "0") == "1":
        # The BASELINE.md probe section carries curated narrative (the
        # full 1-32 ladder + sandwich readings); an ad-hoc partial-level
        # probe must not clobber it, so the rewrite is opt-in.
        write_md(triad, alu)
    print(json.dumps({"triad_gbps": triad, "alu_gops": alu, "window_s": WINDOW_S}))


if __name__ == "__main__":
    main()
