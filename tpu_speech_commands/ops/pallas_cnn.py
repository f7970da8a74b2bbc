"""Fused Pallas kernel for the CNN's first conv block (inference).

ROADMAP.md §3: on the simple_cnn serving path the XLA classifier's HBM
activation traffic is the measured bottleneck, and conv block 1 alone —
the (B, 30, 20, 16) conv output written to and read back from HBM around
the max-pool — is ~60% of it.  This kernel computes

    (B, H, W[, 1]) features -> conv3x3 'SAME' (BN-folded) -> bias ->
    relu6 -> maxpool 2x2 -> (B, H//2, W//2, C)

entirely in VMEM, so the pre-pool tensor never exists in HBM.

TPU mapping (why this shape of kernel wins where im2col did not —
tools/dev/pallas_experiments.py rejected K=9*Cin im2col for wasting the
MXU >=7x on padding):

- The 3x3 single-input-channel conv is ONE matmul against a
  Toeplitz-structured matrix: im2col along y only (K = 3 rows x W cols,
  60 for the default 30x20 input) and the x-taps/out-channels expressed
  by the matrix layout (N = W * C columns).  K=60 pads to 128 (2.1x
  waste, vs 14x for K=9) and N=320 fills 2.5 lane tiles.
- The even-x and odd-x output columns are PACKED side by side in the same
  matmul ([W_even | W_odd]), so the 2x1 half of the max-pool is one
  elementwise max of two static lane slices — no strided lane shuffles.
- Pooling commutes with the monotone bias+relu6 epilogue
  (pool(relu6(z+b)) == relu6(pool(z)+b), bias is per-channel and pool
  windows never cross channels), so bias/clamp run on the 4x-smaller
  pooled tensor.

BatchNorm (inference running stats) folds into the conv weights on the
host; both conv flavors fold to the same matrix — SimpleCNN's dense 3x3
(no bias) and SimpleCNNLite's separable depthwise(3x3,1ch)+pointwise(1x1)
+bias (reference cnn.py:27-40 / :93-106).  Training still runs the XLA
conv (BN batch stats + gradients); this kernel is the serving/eval path.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def fold_block1_params(variables, separable: bool = False):
    """(w3x3[3,3,C], bias[C]) with BatchNorm running stats folded in."""
    params = variables["params"]["block1"]
    stats = variables["batch_stats"]["block1"]["bn"]
    bn = params["bn"]
    scale = np.asarray(bn["scale"], np.float64)
    beta = np.asarray(bn["bias"], np.float64)
    mean = np.asarray(stats["mean"], np.float64)
    var = np.asarray(stats["var"], np.float64)
    mult = scale / np.sqrt(var + 1e-3)  # Keras BN epsilon
    if separable:
        dw = np.asarray(params["depthwise"]["kernel"], np.float64)  # (3,3,1,1)
        pw = np.asarray(params["pointwise"]["kernel"], np.float64)  # (1,1,1,C)
        conv_bias = np.asarray(params["pointwise"]["bias"], np.float64)
        w = dw[:, :, 0, 0][:, :, None] * pw[0, 0, 0][None, None, :]
    else:
        w = np.asarray(params["conv"]["kernel"], np.float64)[:, :, 0, :]
        conv_bias = 0.0
    w = w * mult[None, None, :]
    b = (conv_bias - mean) * mult + beta
    return w, b


def _toeplitz_matrix(w: np.ndarray, width: int) -> np.ndarray:
    """(3*width, 2 * (width//2) * C) packed [even_x | odd_x] conv matrix.

    Row (dy, xin) -> column (parity, xo, c) carries w[dy, xin - xout + 1, c]
    for the 'SAME' 3x3 taps |xin - xout| <= 1 with xout = 2*xo + parity.
    An odd `width` drops the last column (VALID 2x2 pool), matching
    nn.max_pool.
    """
    n_ch = w.shape[2]
    half = width // 2
    mat = np.zeros((3 * width, 2 * half * n_ch), np.float32)
    for parity in range(2):
        for xo in range(half):
            xout = 2 * xo + parity
            for dy in range(3):
                for dx in range(3):
                    xin = xout + dx - 1
                    if 0 <= xin < width:
                        col = parity * half * n_ch + xo * n_ch
                        mat[dy * width + xin, col : col + n_ch] += w[
                            dy, dx
                        ].astype(np.float32)
    return mat


def make_fused_conv_block1(
    variables,
    n_features: int,
    feature_size: int,
    separable: bool = False,
    batch_tile: int = 16,
    interpret: bool = False,
    compute_dtype=jnp.float32,
):
    """Build the fused (B, H, W[, 1]) -> (B, H//2, W//2, C) block-1 forward.

    B must be a multiple of batch_tile.  compute_dtype=bfloat16 runs the
    conv matmul in bf16 with float32 accumulation (the serving path's
    activation dtype); the epilogue stays float32.
    """
    w, b = fold_block1_params(variables, separable=separable)
    n_ch = w.shape[2]
    height, width = n_features, feature_size
    h_out, w_out = height // 2, width // 2
    n_half = w_out * n_ch
    mat = _toeplitz_matrix(w, width)
    bias_row = np.tile(b.astype(np.float32), w_out)[None, :]  # (1, n_half)
    m_rows = batch_tile * height

    def kernel(x_ref, w_ref, b_ref, out_ref):
        x = x_ref[:].reshape(m_rows, width)
        # im2col along y only: rows are (b, y) b-major, so the y+-1
        # neighbours are +-1 sublane shifts; batch-boundary rows (y==0 /
        # y==height-1) take zeros, implementing the conv's 'SAME' y-pad
        rows = jax.lax.broadcasted_iota(jnp.int32, (m_rows, 1), 0)
        zero_row = jnp.zeros((1, width), jnp.float32)
        up = jnp.where(rows % height == 0, 0.0,
                       jnp.concatenate([zero_row, x[:-1]], 0))
        down = jnp.where(rows % height == height - 1, 0.0,
                         jnp.concatenate([x[1:], zero_row], 0))
        k = jnp.concatenate([up, x, down], 1)  # (M, 3*width)
        acts = jnp.dot(k.astype(compute_dtype),
                       w_ref[:].astype(compute_dtype),
                       preferred_element_type=jnp.float32)  # (M, 2*n_half)
        xp = jnp.maximum(acts[:, :n_half], acts[:, n_half:])  # 2x1 x-pool
        # 1x2 y-pool: adjacent (b, y) row pairs; an odd height drops the
        # last row (VALID pooling)
        pairs = xp.reshape(batch_tile, height, n_half)[:, : 2 * h_out]
        yp = jnp.max(pairs.reshape(batch_tile, h_out, 2, n_half), axis=2)
        out = jnp.clip(yp + b_ref[:], 0.0, 6.0)  # bias + relu6, post-pool
        out_ref[:] = out

    mat_dev = jnp.asarray(mat)
    bias_dev = jnp.asarray(bias_row)

    def forward(x: jax.Array) -> jax.Array:
        if x.ndim == 4:  # (B, H, W, 1) model-input layout
            x = x[..., 0]
        batch = x.shape[0]
        if batch % batch_tile != 0:
            raise ValueError(
                f"batch {batch} not a multiple of batch_tile {batch_tile}"
            )
        if x.shape[1:] != (height, width):
            raise ValueError(
                f"expected (B, {height}, {width}) features, got {x.shape}"
            )
        grid = (batch // batch_tile,)
        pooled = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((batch_tile, height, width), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(mat.shape, lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(bias_row.shape, lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (batch_tile, h_out, n_half), lambda i: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            out_shape=jax.ShapeDtypeStruct((batch, h_out, n_half),
                                           jnp.float32),
            cost_estimate=pl.CostEstimate(
                flops=2 * batch * height * 3 * width * 2 * n_half,
                bytes_accessed=x.size * x.dtype.itemsize
                + batch * h_out * n_half * 4,
                transcendentals=0,
            ),
            interpret=interpret,
        )(x.astype(jnp.float32), mat_dev, bias_dev)
        # (xo, c) c-fastest IS the NHWC flatten: a free view, not a shuffle
        return pooled.reshape(batch, h_out, w_out, n_ch)

    return forward


def make_fused_cnn_forward(
    model,
    variables,
    n_features: int | None = None,
    feature_size: int | None = None,
    batch_tile: int = 16,
    interpret: bool = False,
    compute_dtype=jnp.float32,
):
    """Inference forward for SimpleCNN/SimpleCNNLite with block 1 fused:
    Pallas kernel -> model.apply(..., skip_block1=True) for the rest."""
    if n_features is None or feature_size is None:
        from ..params import pr

        n_features = n_features or pr.n_features
        feature_size = feature_size or pr.feature_size

    block1 = make_fused_conv_block1(
        variables,
        n_features=n_features,
        feature_size=feature_size,
        separable=model.separable,
        batch_tile=batch_tile,
        interpret=interpret,
        compute_dtype=compute_dtype,
    )

    def forward(x: jax.Array) -> jax.Array:
        pooled = block1(x)
        return model.apply(variables, pooled, train=False, skip_block1=True)

    return forward
