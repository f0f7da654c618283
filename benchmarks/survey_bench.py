"""Survey-scale end-to-end benchmark: raw EK60 files on disk -> global MVBS.

This measures the BASELINE.md north-star metric — survey GB/s *including*
host datagram decode, calibration-parameter resolution, H2D transfers, and
device binning — not the in-HBM kernel microbenchmark (bench.py).

Usage:
    python benchmarks/survey_bench.py [--gb 2.0] [--files 8] [--chunk-pings N]

Prints one JSON line:
    {"metric": "...", "gb": ..., "seconds": ..., "gb_per_sec": ...,
     "pings_per_sec": ..., "stages": {...}}

Synthetic files mirror the survey shape (5 channels x 4,000 samples/ping,
1 ping/s, random int16 power) and are cached under --cache-dir across runs.
"""

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tests"))

N_CHANNELS = 5
N_SAMPLES = 4000
FREQS = (18000.0, 38000.0, 70000.0, 120000.0, 200000.0)
CHANNELS = tuple(
    f"GPT {int(f / 1000):3d} kHz 00907203{i:04x} {i + 1}-1 ES{int(f / 1000)}"
    for i, f in enumerate(FREQS)
)


def write_survey_file(path, n_pings, t0, seed):
    """One synthetic survey .raw via the tested datagram builders."""
    from synth_ek60 import make_con0, make_raw0

    rng = np.random.default_rng(seed)
    txs = [
        {"channel_id": cid, "frequency": f, "gain": 25.0 + i}
        for i, (cid, f) in enumerate(zip(CHANNELS, FREQS))
    ]
    with open(path, "wb") as fh:
        fh.write(make_con0(t0, txs))
        for p in range(n_pings):
            ts = t0 + np.timedelta64(p, "s")
            pw_all = rng.integers(-12000, -2000, (N_CHANNELS, N_SAMPLES), dtype=np.int16)
            for c in range(N_CHANNELS):
                fh.write(
                    make_raw0(ts, c + 1, power_idx=pw_all[c], frequency=FREQS[c])
                )


def ensure_survey(total_gb: float, n_files: int, cache_dir: Path):
    """Create (or reuse) a multi-file synthetic survey of ~total_gb."""
    bytes_per_ping = N_CHANNELS * (2 * N_SAMPLES + 88)  # RAW0 header+frame+payload
    n_pings_total = int(total_gb * 1e9 / bytes_per_ping)
    pings_per_file = max(1, n_pings_total // n_files)
    tag = f"{total_gb:g}gb_{n_files}f"
    d = cache_dir / f"ep_tpu_survey_{tag}"
    files = [d / f"SB{i:02d}-D20210101-T000000.raw" for i in range(n_files)]
    if not all(f.exists() for f in files):
        d.mkdir(parents=True, exist_ok=True)
        t0 = np.datetime64("2021-01-01T00:00:00", "ns")
        for i, f in enumerate(files):
            if not f.exists():
                write_survey_file(
                    f, pings_per_file, t0 + np.timedelta64(i * pings_per_file, "s"), seed=i
                )
    return files, pings_per_file * n_files


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--gb", type=float, default=2.0)
    ap.add_argument("--files", type=int, default=8)
    ap.add_argument("--chunk-pings", type=int, default=2000)
    ap.add_argument("--cache-dir", default="/tmp")
    args = ap.parse_args()

    from echopype_tpu.parallel import run_survey_mvbs_from_raw
    from echopype_tpu.utils.profiling import StageTimer

    files, n_pings = ensure_survey(args.gb, args.files, Path(args.cache_dir))
    total_bytes = sum(f.stat().st_size for f in files)

    timer = StageTimer()
    t0 = time.perf_counter()
    mvbs = run_survey_mvbs_from_raw(
        files,
        sonar_model="EK60",
        range_bin_m=20.0,
        ping_time_bin="20s",
        chunk_pings=args.chunk_pings,
        timer=timer,
    )
    dt = time.perf_counter() - t0

    out_shape = list(np.asarray(mvbs["Sv"].values).shape)
    print(json.dumps({
        "metric": "EK60 survey raw->MVBS end-to-end (incl. decode+transfers)",
        "gb": round(total_bytes / 1e9, 3),
        "seconds": round(dt, 2),
        "gb_per_sec": round(total_bytes / 1e9 / dt, 3),
        "pings_per_sec": round(n_pings / dt, 1),
        "mvbs_shape": out_shape,
        "stages": timer.report(log=False),
    }))


if __name__ == "__main__":
    main()
