"""Time-fold-to-lanes rewrite of the HiFi-GAN low-channel tail.

The serving profile (B=16, T_mel=256, bf16, TPU v5e) puts ~27ms of the 37ms
HiFi-GAN forward in the last two upsample stages, where channel counts drop
to 64/32 while sample counts grow to 32k/65k.  A conv at 32 output channels
uses 32 of the MXU's 128 lanes — 4x waste on the most sample-heavy stages
(reference structure: e2e_tts/models/vocoder/generator.py:13-62,
layers.py:10-46; this rewrite has no reference analogue — it is a TPU
layout transform).

The fix is algebraic, not approximate: reshape ``(B, T, C)`` row-major into
``(B, T/F, F*C)`` with ``F = 128 // C`` so each "folded frame" packs F
consecutive samples across the full 128 lanes, and precompute, for every
conv in the tail, a dense folded kernel ``(k', F*C, F*C)`` such that a
stride-1 SAME conv over folded frames reproduces the original dilated conv
exactly:

    y[t] = sum_j x[t + (j-c)*d] W[j]
    <=>  yf[t', q*C+co] = sum_{o,p,ci} xf[t'+o, p*C+ci] Wf[o, p*C+ci, q*C+co]
         with j = c + (o*F + p - q)/d   (zero where non-integral/out of range)

Transposed convs fold the same way (output fold F_out = F_in * stride keeps
the folded sequence length constant through the whole tail, so refolding to
the next stage's F is a free row-major reshape).  The folded kernels carry
zero blocks — extra MACs — but lane utilization goes 4x up; measured on
v5e this is 2.2x wall-clock on the 32-channel stage and neutral on the
64-channel stage.  Everything stays plain XLA convs: fusion, autodiff and
CPU fallback all keep working.  fold_tail_params() runs once at engine
construction.

Parity: tests/test_folded.py checks the folded forward against the flax
generator at f32 (<1e-3 rel) and the engine path end to end.
"""

from __future__ import annotations

from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

LANES = 128
LRELU_SLOPE = 0.1


# --------------------------------------------------------------------------
# Folded-weight construction (host-side, once per bundle load)
# --------------------------------------------------------------------------

def fold_conv_weight(w: np.ndarray, dilation: int, f_in: int) -> np.ndarray:
    """(k, C, C) SAME dilated conv -> (k', f_in*C, f_in*C) folded conv."""
    k, c_in, c_out = w.shape
    assert c_in == c_out, "resblock convs are square"
    c = (k - 1) // 2
    h = c * dilation
    hf = -(-h // f_in)
    wf = np.zeros((2 * hf + 1, f_in * c_in, f_in * c_out), np.float32)
    for o in range(-hf, hf + 1):
        for p in range(f_in):
            for q in range(f_in):
                num = o * f_in + p - q
                if num % dilation:
                    continue
                j = c + num // dilation
                if 0 <= j < k:
                    wf[o + hf, p * c_in:(p + 1) * c_in,
                       q * c_out:(q + 1) * c_out] = w[j]
    return wf


def fold_convT_weight(
    w: np.ndarray, stride: int, f_in: int
) -> Tuple[np.ndarray, int]:
    """(k, C_in, C_out) transposed conv (torch pad=(k-s)//2, out=T*s) folded
    from input fold f_in to output fold f_in*s (same folded length).
    Returns (wf, left_pad_frames)."""
    k, c_in, c_out = w.shape
    p_pad = (k - stride) // 2
    f_out = f_in * stride
    taps: List[Tuple[int, int, int]] = []
    lo, hi = 10**9, -(10**9)
    for q in range(f_out):
        for j in range(k):
            num = q + p_pad - j
            if num % stride:
                continue
            u = num // stride  # input sample offset from f_in * t'
            o = u // f_in  # floor division handles negatives
            lo, hi = min(lo, o), max(hi, o)
            taps.append((u, j, q))
    wf = np.zeros((hi - lo + 1, f_in * c_in, f_out * c_out), np.float32)
    for u, j, q in taps:
        o = u // f_in
        p = u - o * f_in
        wf[o - lo, p * c_in:(p + 1) * c_in, q * c_out:(q + 1) * c_out] += w[j]
    return wf, -lo


def fold_head_weight(w: np.ndarray, f_in: int) -> Tuple[np.ndarray, int]:
    """(k, C, C_head) SAME conv with C_head != C (conv_post) folded on the
    input side only: (k', f_in*C, f_in*C_head).  Returns (wf, left_pad)."""
    k, c_in, c_head = w.shape
    c = (k - 1) // 2
    hf = -(-c // f_in)
    wf = np.zeros((2 * hf + 1, f_in * c_in, f_in * c_head), np.float32)
    for o in range(-hf, hf + 1):
        for p in range(f_in):
            for q in range(f_in):
                j = c + (o * f_in + p - q)
                if 0 <= j < k:
                    wf[o + hf, p * c_in:(p + 1) * c_in,
                       q * c_head:(q + 1) * c_head] = w[j]
    return wf, hf


def _fuse_wn(p) -> Tuple[np.ndarray, np.ndarray]:
    """(v, g, bias) weight-norm params -> (w, bias) fused, as numpy f32."""
    v = np.asarray(p["v"], np.float32)
    g = np.asarray(p["g"], np.float32)
    feats = v.shape[-1]
    norm = np.linalg.norm(v.reshape(-1, feats), axis=0)
    w = v * (g / np.maximum(norm, 1e-12))[None, None, :]
    return w, np.asarray(p["bias"], np.float32)


# --------------------------------------------------------------------------
# Folded generator
# --------------------------------------------------------------------------

def _conv(x, w, b, dil=1, pad=None):
    k = w.shape[0]
    total = (k - 1) * dil
    if pad is None:
        pad = (total // 2, total - total // 2)
    y = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), window_strides=(1,), padding=[pad],
        rhs_dilation=(dil,), dimension_numbers=("NWC", "WIO", "NWC"))
    return y + b.astype(x.dtype)


def _lrelu(x, slope=LRELU_SLOPE):
    return jnp.where(x >= 0, x, slope * x)


class FoldedHifiGan:
    """HiFi-GAN generator with the low-channel tail folded onto 128 lanes.

    Construction extracts fused (weight-norm-baked) kernels from the flax
    param tree and folds every stage whose output channels divide 128; the
    forward is a pure function of (weights, mel) so jitted serving programs
    can take the prepared pytree as an argument (no giant constants).
    """

    def __init__(self, cfg, params):
        rates = tuple(cfg.upsample_rates)
        ks = tuple(cfg.upsample_kernel_sizes)
        rks = tuple(cfg.resblock_kernel_sizes)
        rds = tuple(tuple(d) for d in cfg.resblock_dilation_sizes)
        assert cfg.resblock == 1, "folded tail supports ResBlock1 configs"
        self.rates, self.ks, self.rks, self.rds = rates, ks, rks, rds

        tr = params["params"]["trunk"]
        weights: Dict[str, Any] = {}
        plan: List[dict] = []
        weights["conv_pre"] = _fuse_wn(tr["conv_pre"])

        ch0 = cfg.upsample_initial_channel
        f_cur = 1
        for i, (u, k) in enumerate(zip(rates, ks)):
            ch = ch0 // (2 ** (i + 1))
            w_up, b_up = _fuse_wn(tr[f"up_{i}"])
            fold = LANES % ch == 0 and ch < LANES
            st = {"i": i, "u": u, "fold": fold}
            if fold:
                wf, lpad = fold_convT_weight(w_up, u, f_cur)
                st["up_lpad"] = lpad  # static: stays out of the pytree
                # bias tiled over the packed sub-positions of the fold
                st["up"] = (jnp.asarray(wf), jnp.asarray(np.tile(b_up, f_cur * u)))
                f_new = LANES // ch
                st["f"] = f_new
                st["ch"] = ch
                for j, rk in enumerate(rks):
                    blk = tr[f"res_{i}_{j}"]
                    for ci, d in enumerate(rds[j]):
                        w1, b1 = _fuse_wn(blk[f"conv1_{ci}"])
                        w2, b2 = _fuse_wn(blk[f"conv2_{ci}"])
                        st[f"r{j}_{ci}"] = (
                            jnp.asarray(fold_conv_weight(w1, d, f_new)),
                            jnp.asarray(np.tile(b1, f_new)),
                            jnp.asarray(fold_conv_weight(w2, 1, f_new)),
                            jnp.asarray(np.tile(b2, f_new)),
                        )
                f_cur = f_new
            else:
                # High-channel stage: the resblocks already fill the MXU, but
                # the transposed conv must NOT run as an lhs-dilated conv
                # (stride-1 over 7/8 inserted zeros).  Polyphase rewrite: the
                # same fold_convT_weight construction at f_in=1 emits all
                # ``u`` sub-positions as output-channel blocks from ONE
                # stride-1 conv — a dense (taps*C_in, u*C_out) matmul — and a
                # free row-major reshape interleaves them back in time.
                assert f_cur == 1, "high-channel stage after a folded stage"
                wf, lpad = fold_convT_weight(w_up, u, 1)
                st["up_lpad"] = lpad
                st["up"] = (jnp.asarray(wf), jnp.asarray(np.tile(b_up, u)))
                st["f"] = 1
                st["ch"] = ch
                for j, rk in enumerate(rks):
                    blk = tr[f"res_{i}_{j}"]
                    for ci, d in enumerate(rds[j]):
                        w1, b1 = _fuse_wn(blk[f"conv1_{ci}"])
                        w2, b2 = _fuse_wn(blk[f"conv2_{ci}"])
                        st[f"r{j}_{ci}"] = (
                            jnp.asarray(w1), jnp.asarray(b1),
                            jnp.asarray(w2), jnp.asarray(b2),
                        )
                f_cur = 1
            plan.append(st)

        w_post, b_post = _fuse_wn(params["params"]["conv_post"])
        if f_cur > 1:
            wf, hf = fold_head_weight(w_post, f_cur)
            weights["conv_post"] = (
                jnp.asarray(wf), jnp.asarray(np.tile(b_post, f_cur))
            )
            self.post_pad = hf
        else:
            weights["conv_post"] = (jnp.asarray(w_post), jnp.asarray(b_post))
            self.post_pad = None
        self.final_fold = f_cur

        # weights live in a pytree argument; plan holds them too for
        # convenience but programs should take self.weights as input
        for st in plan:
            i = st["i"]
            weights[f"up_{i}"] = st.pop("up")
            for j in range(len(rks)):
                for ci in range(len(rds[j])):
                    weights[f"res_{i}_{j}_{ci}"] = st.pop(f"r{j}_{ci}")
        self.plan = plan
        self.weights = weights

    # -- forward ------------------------------------------------------------

    def __call__(self, weights, mel, dtype=None):
        """mel (B, T, n_mels) -> waveform (B, T * prod(rates)) float."""
        x = mel
        if dtype is not None:
            x = x.astype(dtype)
        w, b = weights["conv_pre"]
        x = _conv(x, w, b)
        for st in self.plan:
            i, u, f = st["i"], st["u"], st["f"]
            x = _lrelu(x)
            # transposed conv as polyphase stride-1 conv (all stages): the
            # folded length stays constant, sub-positions land in channel
            # blocks, and the row-major reshape interleaves them in time
            wf, bf = weights[f"up_{i}"]
            lpad = st["up_lpad"]
            kf = wf.shape[0]
            y = jax.lax.conv_general_dilated(
                x, wf.astype(x.dtype), window_strides=(1,),
                padding=[(lpad, kf - 1 - lpad)],
                dimension_numbers=("NWC", "WIO", "NWC"))
            x = y + bf.astype(x.dtype)
            B = x.shape[0]
            x = x.reshape(B, -1, f * st["ch"])
            x = self._res_stack(weights, st, x, folded=st["fold"])
        x = _lrelu(x, 0.01)  # torch default slope on the head (generator.py:49)
        if self.final_fold > 1:
            wf, bf = weights["conv_post"]
            hf = self.post_pad
            x = x.astype(jnp.float32)  # head runs f32 like the flax module
            y = jax.lax.conv_general_dilated(
                x, wf, window_strides=(1,),
                padding=[(hf, hf)], dimension_numbers=("NWC", "WIO", "NWC"))
            y = y + bf
            B = y.shape[0]
            x = jnp.tanh(y).reshape(B, -1)
        else:
            w, b = weights["conv_post"]
            x = _conv(x.astype(jnp.float32), w, b)
            x = jnp.tanh(x)[..., 0]
        return x

    def _res_stack(self, weights, st, x, folded: bool):
        i = st["i"]
        acc = None
        for j in range(len(self.rks)):
            h = x
            for ci, d in enumerate(self.rds[j]):
                w1, b1, w2, b2 = weights[f"res_{i}_{j}_{ci}"]
                t = _lrelu(h)
                t = _conv(t, w1, b1, dil=1 if folded else d)
                t = _lrelu(t)
                t = _conv(t, w2, b2)
                h = h + t
            acc = h if acc is None else acc + h
        return acc / len(self.rks)
