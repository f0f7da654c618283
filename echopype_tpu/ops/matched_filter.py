"""FFT matched filter (pulse compression) for EK80 broadband data.

Behavioral contract: echopype/calibrate/ek80_complex.py:285-369 — per-channel
time-domain ``signal.convolve(bs, flip(conj(replica)), mode="full")`` truncated
at ``[replica.size-1:]``, with NaNs zero-filled before and restored after.

TPU-native design: the convolution runs as an FFT product on device.  The
linear convolution of length R+L-1 is computed with a zero-padded FFT, then
sliced to exactly the reference's truncation window — bit-compatible with the
time-domain result up to float rounding.  One dispatch per channel (replica
lengths differ per channel); ping x beam lanes batch in a single FFT.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["pulse_compress_channel", "compress_pulse_batched"]


def _next_fast_len(n: int) -> int:
    """Next 5-smooth size >= n (FFT-friendly)."""
    if n <= 1:
        return 1
    best = 1 << (n - 1).bit_length()
    m = 1
    while m < best:
        k = m
        while k < best:
            j = k
            while j < best:
                if j >= n:
                    best = j
                j *= 5
            k *= 3
        m *= 2
    return best


@partial(jax.jit, static_argnames=("n_fft", "out_start", "out_len"))
def _fft_conv(bs, replica, n_fft: int, out_start: int, out_len: int):
    """bs [..., R] complex, replica [L] complex -> linear conv sliced window."""
    X = jnp.fft.fft(bs, n=n_fft, axis=-1)
    H = jnp.fft.fft(replica, n=n_fft)
    y = jnp.fft.ifft(X * H, axis=-1)
    return jax.lax.dynamic_slice_in_dim(y, out_start, out_len, axis=-1)


def pulse_compress_channel(bs: np.ndarray, replica: np.ndarray) -> np.ndarray:
    """Pulse-compress one channel's complex samples.

    bs: complex [ping, range, beam] (NaN-padded); replica: complex [L]
    (the raw transmit replica — conjugate-flip happens here).
    Returns complex [ping, range, beam] matching the reference truncation.
    """
    rep = np.flipud(np.conj(np.asarray(replica)))
    L = len(rep)
    P, R, B = bs.shape
    nan_mask = np.isnan(bs.real) | np.isnan(bs.imag)
    clean = np.where(nan_mask, 0.0 + 0.0j, bs)
    # batch (ping, beam) lanes; convolve along range
    lanes = clean.transpose(0, 2, 1).reshape(P * B, R)
    n_fft = _next_fast_len(R + L - 1)
    out = _fft_conv(
        jnp.asarray(lanes.astype("complex64")),
        jnp.asarray(rep.astype("complex64")),
        n_fft,
        L - 1,
        R,
    )
    out = np.asarray(out).reshape(P, B, R).transpose(0, 2, 1)
    return np.where(nan_mask, np.nan + 1j * np.nan, out)


def compress_pulse_batched(bs_by_channel, replicas):
    """Pulse-compress a dict/list of per-channel [P,R,B] arrays."""
    return {ch: pulse_compress_channel(bs_by_channel[ch], replicas[ch]) for ch in bs_by_channel}
