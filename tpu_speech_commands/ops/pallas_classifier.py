"""Whole-classifier Pallas megakernel for the CNN families (inference).

One kernel computes features -> logits for SimpleCNN / SimpleCNNLite with
ZERO intermediate HBM traffic: all four conv blocks and both dense layers
run back to back in VMEM.  The XLA path writes/reads every block's
activation tensor to HBM (conv1's pre-pool (B,30,20,16) alone is ~60% of
the measured classifier-side bandwidth gap, ROADMAP.md §3); here the only
HBM touches are the feature read and the (B, C) logit write.

Design (same Toeplitz-matmul scheme as ops/pallas_cnn.py, generalized):

- Every 3x3 conv is ONE MXU matmul against a host-built structured matrix:
  im2col along y only (K = 3 * width * Cin), with the x-taps, x-stride and
  output channels expressed in the matrix layout (N = w_out * Cout).  The
  rejected K=9*Cin im2col wasted the MXU >=7x on padding; these K's
  (60/480/480/576) pad 1.0-2.1x.
- Blocks followed by 2x2 max-pool pack even/odd output columns side by
  side ([W_even | W_odd]) so the x-half of the pool is an elementwise max
  of two lane slices.
- Intermediates are kept FRAME-major, (y, TB, x*c): every y-operation —
  the +-1 shifts feeding the next im2col, the stride-2 row gather of
  block 3, the y-half of each pool — is a static slice/concat on an
  UNTILED leading axis (free address arithmetic, no sublane shuffles).
  The single sublane transpose is the batch-major -> frame-major input
  flip.
- BatchNorm running stats fold into the conv matrices on the host.
  Blocks with the reference's inline relu (block 4, + block 3 for lite —
  cnn.py:53-58) cannot fold BN through the relu, so they apply
  conv(+pre-relu bias) -> relu -> per-channel affine -> relu6 in order;
  BN scale can be negative, so the affine must run pre-pool there.
- SimpleCNNLite's separable convs compose on the host into an effective
  dense kernel (w[dy,dx,ci,co] = depthwise[dy,dx,ci] * pointwise[ci,co]),
  which the same matrix builder consumes.

Training is untouched (BN batch stats + gradients need the XLA graph);
this is the serving/eval forward.  Numerics: float32 matches model.apply
to ~1e-5; compute_dtype=bfloat16 mirrors the XLA serving path's bf16
activations.
"""
from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _ceil_div(a: int, b: int) -> int:
    return -(-a // b)


def _same_pad_lo(dim: int, stride: int, k: int = 3) -> int:
    """XLA/TF SAME low-side padding: total = (out-1)*s + k - dim, low
    half rounded DOWN (the extra unit pads high).  stride 1 / odd dims
    give 1; stride 2 on an EVEN dim gives 0 — hard-coding 1 there was a
    real wrong-logits bug for use_delta-shaped inputs."""
    out = _ceil_div(dim, stride)
    total = max((out - 1) * stride + k - dim, 0)
    return total // 2


@dataclass
class _Stage:
    """One conv block, lowered: matmul matrix + epilogue constants."""

    matrix: np.ndarray        # (3 * width_in * cin, n_cols)
    stride: int
    pool: bool                # pooled blocks pack [even | odd] columns
    inline_relu: bool
    # inline_relu: pre-relu bias, then post-relu affine (BN)
    pre_bias: np.ndarray | None   # (1, n_cols) or None
    scale: np.ndarray | None      # (1, n_cols_half) post-relu BN scale
    bias: np.ndarray              # (1, n_cols_half) final additive term
    h_in: int
    w_in: int
    cin: int
    cout: int

    @property
    def h_out(self) -> int:
        h = _ceil_div(self.h_in, self.stride)
        return h // 2 if self.pool else h

    @property
    def w_out(self) -> int:
        w = _ceil_div(self.w_in, self.stride)
        return w // 2 if self.pool else w


def _conv_matrix(w: np.ndarray, width: int, stride: int,
                 pack_pool: bool) -> np.ndarray:
    """Structured conv matrix: rows (dy, xin, cin), cols (xout, cout) —
    or ([even|odd], xo, cout) when pack_pool (2x1 pool rides the lanes)."""
    cin, cout = w.shape[2], w.shape[3]
    w_conv = _ceil_div(width, stride)
    pad_lo = _same_pad_lo(width, stride)
    half = w_conv // 2
    n_cols = 2 * half * cout if pack_pool else w_conv * cout
    mat = np.zeros((3 * width * cin, n_cols), np.float32)
    for xout in range(w_conv):
        if pack_pool:
            parity, xo = xout % 2, xout // 2
            if xo >= half:
                continue  # odd width: last column dropped by VALID pool
            col0 = parity * half * cout + xo * cout
        else:
            col0 = xout * cout
        for dy in range(3):
            for dx in range(3):
                xin = stride * xout + dx - pad_lo
                if 0 <= xin < width:
                    row0 = dy * width * cin + xin * cin
                    mat[row0 : row0 + cin, col0 : col0 + cout] += w[
                        dy, dx
                    ].astype(np.float32)
    return mat


def _effective_conv_kernel(params: dict, separable: bool) -> tuple:
    """(w[3,3,cin,cout], conv_bias[cout]) for dense or separable blocks."""
    if separable:
        dw = np.asarray(params["depthwise"]["kernel"], np.float64)
        pw = np.asarray(params["pointwise"]["kernel"], np.float64)
        bias = np.asarray(params["pointwise"]["bias"], np.float64)
        # depthwise (3,3,1,cin) grouped -> per-channel taps; pointwise
        # (1,1,cin,cout); composite w[dy,dx,ci,co] = dw[dy,dx,ci]*pw[ci,co]
        dwt = dw[:, :, 0, :]  # feature_group_count=cin: (3,3,cin)
        w = np.einsum("yxc,cd->yxcd", dwt, pw[0, 0])
        return w, bias
    w = np.asarray(params["conv"]["kernel"], np.float64)
    return w, np.zeros(w.shape[3], np.float64)


def _lower_block(params, stats, h_in, w_in, stride, pool, inline_relu,
                 separable) -> _Stage:
    w, conv_bias = _effective_conv_kernel(params, separable)
    bn = params["bn"]
    mult = np.asarray(bn["scale"], np.float64) / np.sqrt(
        np.asarray(stats["var"], np.float64) + 1e-3
    )
    shift = (
        np.asarray(bn["bias"], np.float64)
        - np.asarray(stats["mean"], np.float64) * mult
    )
    cin, cout = w.shape[2], w.shape[3]
    w_conv = _ceil_div(w_in, stride)
    reps = 2 * (w_conv // 2) if pool else w_conv
    reps_half = (w_conv // 2) if pool else w_conv

    def tile(vec, n):  # per-channel constant -> per-column row
        return np.tile(np.asarray(vec, np.float32), n)[None, :]

    if inline_relu:
        # conv + cb -> relu -> *mult + shift -> relu6  (BN can't fold
        # through the relu; mult may be negative so this runs pre-pool)
        mat = _conv_matrix(w, w_in, stride, pack_pool=pool)
        return _Stage(mat, stride, pool, True, tile(conv_bias, reps),
                      tile(mult, reps), tile(shift, reps),
                      h_in, w_in, cin, cout)
    # BN folds into the matrix; bias applies post-pool (pool commutes
    # with the monotone +bias/relu6 epilogue)
    mat = _conv_matrix(w * mult[None, None, None, :], w_in, stride,
                       pack_pool=pool)
    bias = (conv_bias - np.asarray(stats["mean"], np.float64)) * mult + \
        np.asarray(bn["bias"], np.float64)
    return _Stage(mat, stride, pool, False, None, None,
                  tile(bias, reps_half), h_in, w_in, cin, cout)


def lower_classifier(variables, separable: bool, n_features: int,
                     feature_size: int):
    """Host lowering: per-block matrices + the dense head arrays."""
    params = variables["params"]
    stats = variables["batch_stats"]
    # (features, stride, inline_relu, pool) per models/cnn.py SimpleCNN
    spec = [
        ("block1", 1, False, True),
        ("block2", 1, False, True),
        ("block3", 2, separable, False),
        ("block4", 1, True, True),
    ]
    h, w, c = n_features, feature_size, 1
    stages = []
    for name, stride, inline_relu, pool in spec:
        st = _lower_block(params[name], stats[name]["bn"], h, w, stride,
                          pool, inline_relu, separable)
        stages.append(st)
        h, w, c = st.h_out, st.w_out, st.cout
    dense_w = np.asarray(params["feature_dense"]["kernel"], np.float32)
    dense_b = np.asarray(params["feature_dense"]["bias"], np.float32)[None]
    head_w = np.asarray(params["score_predict"]["kernel"], np.float32)
    head_b = np.asarray(params["score_predict"]["bias"], np.float32)[None]
    flat = h * w * c
    if dense_w.shape[0] != flat:
        raise ValueError(
            f"flatten mismatch: conv output {h}x{w}x{c}={flat} vs "
            f"feature_dense kernel {dense_w.shape}"
        )
    return stages, (h, w, c), dense_w, dense_b, head_w, head_b


def make_fused_cnn_classifier(
    variables,
    separable: bool = False,
    n_features: int | None = None,
    feature_size: int | None = None,
    batch_tile: int = 16,
    interpret: bool = False,
    compute_dtype=jnp.float32,
    time_major: bool = False,
):
    """Build the fused (B, H, W[, 1]) features -> (B, C) logits forward.

    time_major consumes (H, B, W) features (the fused frontend's
    time_major output): the kernel's (H, TB, W) block is already the
    frame-major layout run_stage wants, so the input sublane transpose
    disappears."""
    if n_features is None or feature_size is None:
        from ..params import pr

        n_features = n_features or pr.n_features
        feature_size = feature_size or pr.feature_size

    stages, final_hwc, dense_w, dense_b, head_w, head_b = lower_classifier(
        variables, separable, n_features, feature_size
    )
    num_classes = head_w.shape[1]
    fh, fw, fc = final_hwc

    def run_stage(st: _Stage, x3, mats, mi):
        """x3: (h_in, TB, w_in * cin) frame-major -> next frame-major."""
        h_in = st.h_in
        zero = jnp.zeros((1,) + x3.shape[1:], x3.dtype)
        if st.stride == 1:
            mid = x3
            prev = jnp.concatenate([zero, x3[:-1]], 0)
            nxt = jnp.concatenate([x3[1:], zero], 0)
        else:  # stride 2: even/odd row split via pad+reshape+static
            # index — a strided slice here lowers to a (>2D) gather
            # Mosaic rejects.  SAME pad_lo decides which parity holds
            # the tap centers (see _same_pad_lo).
            h_out_conv = _ceil_div(h_in, st.stride)
            x3p = jnp.concatenate([x3, zero], 0) if h_in % 2 else x3
            g = x3p.reshape(h_out_conv, 2, *x3.shape[1:])
            if _same_pad_lo(h_in, st.stride) == 1:  # odd h_in
                # dy taps rows 2k-1 / 2k / 2k+1
                mid = g[:, 0]                   # rows 0, 2, 4, ...
                odd = g[:, 1][: h_in // 2]      # rows 1, 3, 5, ... (real)
                prev = jnp.concatenate([zero, odd], 0)[:h_out_conv]
                nxt = jnp.concatenate([odd, zero], 0)[:h_out_conv]
            else:  # even h_in: dy taps rows 2k / 2k+1 / 2k+2
                prev = g[:, 0]                  # rows 0, 2, 4, ...
                mid = g[:, 1]                   # rows 1, 3, 5, ...
                nxt = jnp.concatenate([g[1:, 0], zero], 0)
        k3 = jnp.concatenate([prev, mid, nxt], axis=2)  # (h', TB, 3*w*cin)
        h_rows = k3.shape[0]
        k2 = k3.reshape(h_rows * batch_tile, k3.shape[2])
        acts = jnp.dot(k2.astype(compute_dtype), mats[mi],
                       preferred_element_type=jnp.float32)
        n_cols = acts.shape[1]
        if st.inline_relu:
            z = acts + mats[mi + 1]                      # pre-relu bias
            z = jnp.maximum(z, 0.0)
            z = jnp.clip(z * mats[mi + 2] + mats[mi + 3], 0.0, 6.0)
            if st.pool:
                half = n_cols // 2
                z = jnp.maximum(z[:, :half], z[:, half:])
            out = z
        else:
            if st.pool:
                half = n_cols // 2
                acts = jnp.maximum(acts[:, :half], acts[:, half:])
            out = jnp.clip(acts + mats[mi + 1], 0.0, 6.0)
        out3 = out.reshape(h_rows, batch_tile, out.shape[1])
        if st.pool:  # y-half of the pool: untiled leading-axis row pairs
            h_out = h_rows // 2
            out3 = jnp.max(
                out3[: 2 * h_out].reshape(h_out, 2, batch_tile, out3.shape[2]),
                axis=1,
            )
        n_mats = 4 if st.inline_relu else 2
        return out3, mi + n_mats

    def kernel(x_ref, *refs):
        mats = [r[:] for r in refs[:-1]]
        out_ref = refs[-1]
        # batch-major (TB, H, W) -> frame-major (H, TB, W): the kernel's
        # one sublane transpose (upcast first — packed-bf16 sublane
        # shuffles lower badly).  time_major blocks arrive (H, TB, W).
        x3 = x_ref[:].astype(jnp.float32)
        if not time_major:
            x3 = jnp.swapaxes(x3, 0, 1)
        mi = 0
        for st in stages:
            x3, mi = run_stage(st, x3, mats, mi)
        # flatten NHWC (y, x, c): y blocks side by side on the lane axis
        flat = jnp.concatenate([x3[i] for i in range(fh)], axis=1)
        hidden = jnp.clip(
            jnp.dot(flat.astype(compute_dtype), mats[mi],
                    preferred_element_type=jnp.float32) + mats[mi + 1],
            0.0, 6.0,
        )
        logits = jnp.dot(hidden.astype(compute_dtype), mats[mi + 2],
                         preferred_element_type=jnp.float32) + mats[mi + 3]
        out_ref[:] = logits

    # operand list: per-stage matrices then dense/head
    mat_arrays: list[np.ndarray] = []
    for st in stages:
        if st.inline_relu:
            mat_arrays += [st.matrix, st.pre_bias, st.scale, st.bias]
        else:
            mat_arrays += [st.matrix, st.bias]
    mat_arrays += [dense_w, dense_b, head_w, head_b]
    # matmul operands travel in compute dtype (halves their VMEM/BW in
    # bf16 mode); epilogue constants stay f32
    matmul_ids = set()
    mi = 0
    for st in stages:
        matmul_ids.add(mi)
        mi += 4 if st.inline_relu else 2
    matmul_ids.update({mi, mi + 2})
    mat_devs = [
        jnp.asarray(m, compute_dtype if i in matmul_ids else jnp.float32)
        for i, m in enumerate(mat_arrays)
    ]

    flops_tile = 0
    for st in stages:
        h_rows = _ceil_div(st.h_in, st.stride)
        flops_tile += 2 * h_rows * batch_tile * st.matrix.shape[0] * \
            st.matrix.shape[1]
    flops_tile += 2 * batch_tile * (
        dense_w.shape[0] * dense_w.shape[1] + head_w.shape[0] * head_w.shape[1]
    )

    def forward(x: jax.Array) -> jax.Array:
        if x.ndim == 4:
            x = x[..., 0]
        batch = x.shape[1] if time_major else x.shape[0]
        if batch % batch_tile != 0:
            raise ValueError(
                f"batch {batch} not a multiple of batch_tile {batch_tile}"
            )
        expect = ((n_features, batch, feature_size) if time_major
                  else (batch, n_features, feature_size))
        if x.shape != expect:
            raise ValueError(
                f"expected {expect} features "
                f"({'time' if time_major else 'batch'}-major), got {x.shape}"
            )
        grid = (batch // batch_tile,)
        x_spec = (
            pl.BlockSpec((n_features, batch_tile, feature_size),
                         lambda i: (0, i, 0), memory_space=pltpu.VMEM)
            if time_major else
            pl.BlockSpec((batch_tile, n_features, feature_size),
                         lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
        )
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[x_spec] + [
                # n=… default arg: bind per-matrix rank now (a bare
                # closure over the loop variable would see only the last)
                pl.BlockSpec(m.shape,
                             (lambda i, n=m.ndim: (0,) * n),
                             memory_space=pltpu.VMEM)
                for m in mat_arrays
            ],
            out_specs=pl.BlockSpec(
                (batch_tile, num_classes), lambda i: (i, 0),
                memory_space=pltpu.VMEM,
            ),
            out_shape=jax.ShapeDtypeStruct((batch, num_classes),
                                           jnp.float32),
            cost_estimate=pl.CostEstimate(
                flops=flops_tile * grid[0],
                bytes_accessed=x.size * x.dtype.itemsize
                + batch * num_classes * 4,
                transcendentals=0,
            ),
            interpret=interpret,
        )(x if x.dtype == jnp.bfloat16 else x.astype(jnp.float32),
          *mat_devs)

    return forward
