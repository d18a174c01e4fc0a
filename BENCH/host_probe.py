import multiprocessing as mp
import time
import numpy as np


def cpu_task(_):
    x = np.arange(1 << 16, dtype=np.uint64)
    acc = np.uint64(0)
    with np.errstate(over="ignore"):
        for _ in range(300):
            acc = (x * np.uint64(0x9E3779B97F4A7C15) + acc).sum()
    return int(acc)


def mem_task(_):
    x = np.arange(1 << 23, dtype=np.float64)
    s = 0.0
    for _ in range(60):
        s += float((x * 1.0000001).sum())
    return s


def run(fn, nproc):
    with mp.Pool(nproc) as p:
        p.map(fn, [None] * nproc)  # warm pool
        t0 = time.perf_counter()
        p.map(fn, [None] * (nproc * 4))
        dt = time.perf_counter() - t0
    return nproc * 4 / dt


if __name__ == "__main__":
    for name, fn in (("cpu", cpu_task), ("mem", mem_task)):
        rates = {}
        for n in (2, 4, 8, 16, 32):
            rates[n] = run(fn, n)
        print(
            f"{name}: tasks/s "
            + " ".join(f"{n}={rates[n]:.2f}" for n in (2, 4, 8, 16, 32))
            + f"  eff_2to8={rates[8] / (4 * rates[2]):.3f}"
            + f" eff_4to16={rates[16] / (4 * rates[4]):.3f}"
            + f" eff_8to32={rates[32] / (4 * rates[8]):.3f}"
        )

# Provenance: round-3 host-capacity probe (see BENCH/BASELINE.md round 3).
# Run: python BENCH/host_probe.py  — prints tasks/s at 8/16/32 worker
# processes for a pure-CPU numpy kernel and a 64 MB-streaming kernel, plus
# the 8->32 scaling efficiency of each. No Ray, no ocr_ray: any efficiency
# deficit it reports is the HOST's (vCPU overcommit / shared DRAM), and is
# the correct baseline to read the pipeline's efficiency numbers against.
