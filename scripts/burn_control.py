"""CPU-burn scaling control for the shared bench box.

Runs a fixed pure-Python workload across N worker processes at two
parallelism levels (8 and 32) and reports the throughput ratio — the
*ceiling* any CPU-bound pipeline can achieve on this box, independent of
Ray. Used to contextualize bench.py --scaling numbers in BASELINE.md:
if the box itself only scales at 0.80 from 8 to 32 processes, a pipeline
efficiency of 0.80 is perfect.

Usage: python scripts/burn_control.py   -> one JSON line
"""

from __future__ import annotations

import json
import multiprocessing as mp
import time

# Total work is fixed; it is split evenly across the worker pool so the
# ideal wall-clock ratio between 8 and 32 workers is exactly 4x.
TOTAL_UNITS = 192
UNIT_ITERS = 2_500_000


def _burn(units: int) -> int:
    acc = 0
    for _ in range(units):
        x = 0
        for i in range(UNIT_ITERS):
            x = (x * 1103515245 + 12345 + i) & 0x7FFFFFFF
        acc ^= x
    return acc


def run(nproc: int) -> float:
    per = TOTAL_UNITS // nproc
    t0 = time.time()
    with mp.Pool(nproc) as pool:
        pool.map(_burn, [per] * nproc)
    return time.time() - t0


def main() -> None:
    # warmup: fork pool once so page-in cost isn't in the first sample
    run(8 // 2)
    lo = run(8)
    hi = run(32)
    eff = (lo / hi) / 4.0
    print(
        json.dumps(
            {
                "metric": "pure-python CPU burn scaling control, 8 -> 32 processes",
                "sec_8": round(lo, 2),
                "sec_32": round(hi, 2),
                "ceiling_efficiency": round(eff, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
