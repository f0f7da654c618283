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

__all__ = ["pulse_compress_channel", "compress_pulse_batched", "set_conv_precision"]

# Speed/accuracy knob for the MXU conv fallback (measured on v5e, 2000 pings
# x 4 sectors x 8192 samples, L=500):
#   HIGHEST: 3,129 pings/s, <=1e-4 dB of the f64 matched filter (default)
#   HIGH:    5,862 pings/s, <=0.004 dB within 40 dB of peak (0.02 dB at -60 dB)
#   DEFAULT: bf16 multiplies, 0.6-2.4 dB error -- never acceptable here
_CONV_PRECISION = jax.lax.Precision.HIGHEST


def set_conv_precision(precision) -> None:
    """Set the matched-filter conv precision ("HIGHEST" or "HIGH").

    HIGH roughly doubles broadband pulse-compression throughput at the cost
    of ~0.004 dB (strong echoes) to ~0.02 dB (60 dB below peak) vs f64.
    """
    global _CONV_PRECISION
    if isinstance(precision, str):
        precision = getattr(jax.lax.Precision, precision.upper())
    _CONV_PRECISION = precision


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


@partial(jax.jit, static_argnames=("out_start", "out_len", "precision"))
def _mxu_conv_real(xr, xi, hr, hi, out_start: int, out_len: int, precision=None):
    """Linear complex convolution on the TPU convolution unit — the fallback
    when the runtime lacks FFT/complex support entirely (the axon backend
    returns UNIMPLEMENTED even for device_put of complex64, so inputs and
    outputs here are split real/imag f32).

    Design (all measured on v5e, 2000 pings x 4 sectors x 8192 samples,
    L=500, HIGHEST precision):

    - 3-mult Karatsuba as a GROUPED conv (feature_group_count=3 with
      1-in/1-out channels per group): 171 ms.  The dense 2-in/2-out channel
      form of the same math takes 640 ms — grouped single-channel convs
      lower far better on TPU.  Karatsuba's m3-m1-m2 cancellation costs
      ~7e-4 dB max (2.5e-5 dB p99) within 60 dB of the peak vs the f64
      matched filter — an order below the domain's golden tolerances.
    - asymmetric padding computes ONLY the requested output window (the
      reference's [L-1:] truncation), saving the wasted L-1 columns and the
      post-slice copy (+25% alone).
    """
    L = hr.shape[0]
    W = xr.shape[-1]
    hr_f, hi_f = hr[::-1], hi[::-1]
    # Karatsuba: m1 = xr*hr, m2 = xi*hi, m3 = (xr+xi)*(hr+hi)
    #            real = m1 - m2, imag = m3 - m1 - m2  (post-ops, exact in f32)
    x3 = jnp.stack([xr, xi, xr + xi], axis=1)
    k = jnp.stack([hr_f, hi_f, hr_f + hi_f], axis=0)[:, None, :]  # [O=3, I=1, L]
    pad_left = L - 1 - out_start
    pad_right = out_len + L - 1 - W - pad_left
    y = jax.lax.conv_general_dilated(
        x3, k, window_strides=(1,), padding=[(pad_left, pad_right)],
        dimension_numbers=("NCH", "OIH", "NCH"),
        feature_group_count=3,
        # TPU convs default to bf16 multiplies; matched filtering needs the
        # full f32 significand (bf16 showed ~0.4 dB error near the noise floor)
        precision=precision if precision is not None else jax.lax.Precision.HIGHEST,
    )
    m1, m2, m3 = y[:, 0, :], y[:, 1, :], y[:, 2, :]
    return m1 - m2, m3 - m1 - m2


_FFT_OK = None


def _fft_supported() -> bool:
    """Does the default backend support complex64 + jnp.fft?

    The axon TPU runtime supports neither — and probing by execution poisons
    the runtime stream (a failed complex transfer makes every later readback
    raise UNIMPLEMENTED), so detection is by platform identity: any backend
    whose platform_version names axon takes the real-split conv path.  CPU,
    GPU, and standard Cloud TPU runtimes all execute jnp.fft.
    """
    global _FFT_OK
    if _FFT_OK is None:
        try:
            version = getattr(jax.devices()[0].client, "platform_version", "")
        except Exception:  # noqa: BLE001 - no backend at all
            version = ""
        _FFT_OK = "axon" not in version
    return _FFT_OK


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
    if _fft_supported():
        n_fft = _next_fast_len(R + L - 1)
        out = _fft_conv(
            jnp.asarray(lanes.astype("complex64")),
            jnp.asarray(rep.astype("complex64")),
            n_fft,
            L - 1,
            R,
        )
    else:
        re, im = _mxu_conv_real(
            jnp.asarray(np.ascontiguousarray(lanes.real, dtype="f4")),
            jnp.asarray(np.ascontiguousarray(lanes.imag, dtype="f4")),
            jnp.asarray(np.ascontiguousarray(rep.real, dtype="f4")),
            jnp.asarray(np.ascontiguousarray(rep.imag, dtype="f4")),
            L - 1,
            R,
            precision=_CONV_PRECISION,
        )
        out = np.asarray(re).astype("f8") + 1j * np.asarray(im).astype("f8")
    out = np.asarray(out).reshape(P, B, R).transpose(0, 2, 1)
    return np.where(nan_mask, np.nan + 1j * np.nan, out)


def compress_pulse_batched(bs_by_channel, replicas):
    """Pulse-compress a dict/list of per-channel [P,R,B] arrays."""
    return {ch: pulse_compress_channel(bs_by_channel[ch], replicas[ch]) for ch in bs_by_channel}
