"""Negative result #4: XLA-level bf16x2 error-compensated data-operand split.

The round-4 sweep measured three recovery designs for the exact-precision
binning cost (docs/PERFORMANCE.md "Recovering the precision-fix cost") but
skipped the cheapest candidate: split the linear-Sv data operand into
hi = bf16(A) and lo = bf16(A - hi), run TWO DEFAULT-precision dots
(one native bf16 pass each, f32 accumulate, the 0/1 membership operand is
bf16-exact) instead of HIGHEST's three passes — a ~1/3 MAC saving on the
data side.

This script settles it on ERROR grounds alone, measurable exactly on CPU
(bf16 values are exact in f32, the mask is 0/1, and the MXU accumulates in
f32, so the split's representation error IS the on-chip error):

    bf16x2 effective mantissa ~16 bits -> worst-case bin error
    ~2.8e-5 dB on single-sample/constant bins (measured below), against the
    <=1e-5 dB bin contract (docs/PERFORMANCE.md round-4 precision
    correction).  Statistically mixed bins cancel to ~1e-6 dB, but the
    contract is worst-case.  REJECTED without needing chip timing; the
    exact (HIGHEST, DEFAULT) path stays.

Run: PYTHONPATH=. python benchmarks/exp_bf16x2_split.py
"""

import numpy as np

try:
    import ml_dtypes
except ImportError:  # pragma: no cover
    raise SystemExit("ml_dtypes required (ships with jax)")

BUDGET_DB = 1e-5


def bf16(x):
    return x.astype(ml_dtypes.bfloat16).astype(np.float32)


def main():
    rng = np.random.default_rng(0)
    cases = {
        "uniform": rng.uniform(-90, -30, (4096, 50)).astype(np.float32),
        "quiet-after-loud": np.concatenate(
            [np.full((4096, 25), -30.0), np.full((4096, 25), -90.0)], 1
        ).astype(np.float32),
        "single-sample-bins": rng.uniform(-90, -30, (1, 50)).astype(np.float32),
    }
    worst = 0.0
    for name, sv in cases.items():
        lin = np.power(10.0, sv.astype(np.float64) / 10.0).astype(np.float32)
        hi = bf16(lin)
        lo = bf16(lin - hi)
        approx = hi.astype(np.float64) + lo.astype(np.float64)
        s_exact = lin.astype(np.float64).sum(0)
        db = float(np.max(np.abs(10 * np.log10(approx.sum(0) / s_exact))))
        worst = max(worst, db)
        print(f"{name:22s} bin-sum max error {db:.3e} dB")
    print(
        f"worst case {worst:.3e} dB vs budget {BUDGET_DB:.0e} dB -> "
        + ("PASS" if worst <= BUDGET_DB else "REJECTED (negative result #4)")
    )


if __name__ == "__main__":
    main()
