"""DeepSpeech2 acoustic model, TPU-native (flax.linen + lax.scan).

Capability parity with the reference model (deepspeech_pytorch/model.py:138-310):
conv frontend with per-module length masking (model.py:42-69), N recurrent
layers with sequence-wise BatchNorm and *summed* bidirectional outputs
(model.py:80-102), optional Lookahead conv for unidirectional models
(model.py:105-135), BatchNorm+Linear head (model.py:195-201), softmax on
eval outputs only (model.py:72-77), and RNN hidden-state carry across calls
for chunked streaming inference (model.py:223-229).

TPU-first design decisions (not a translation):
  * everything is static-shape; variable lengths are handled by masks, not
    packed sequences (pack_padded_sequence has no XLA analog and would force
    dynamic shapes);
  * each recurrent layer hoists the input projection of ALL timesteps into a
    single large MXU matmul ((T*B, D) @ (D, 4H)), then `lax.scan`s only the
    (B, H) @ (H, 4H) recurrent half;
  * the backward direction is the same scan over a length-aware reversed
    copy (gather with an involutive index map), outputs summed with forward;
  * BatchNorm follows torch semantics exactly (biased var for normalization,
    unbiased var into running stats, momentum 0.1) so imported reference
    checkpoints are numerically faithful;
  * compute dtype is a knob (bfloat16 for training/serving, float32 for
    parity tests); params always live in float32.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from dsjax.config import BiDirectionalConfig, RNNType, SpectConfig, UniDirectionalConfig

Array = jax.Array


def get_seq_lens(lengths: Array) -> Array:
    """Time-length propagation through the conv stack.

    Both convs use time kernel 11, pad 5; strides 2 then 1
    (reference: model.py:299-310): L -> (L - 1) // 2 + 1.
    """
    lengths = lengths.astype(jnp.int32)
    l1 = (lengths + 2 * 5 - 1 * (11 - 1) - 1) // 2 + 1
    l2 = (l1 + 2 * 5 - 1 * (11 - 1) - 1) // 1 + 1
    return l2


def rnn_input_size(spect_cfg: SpectConfig) -> int:
    """Flattened conv-output feature size (reference: model.py:166-169)."""
    size = int(np.floor(spect_cfg.sample_rate * spect_cfg.window_size / 2) + 1)
    size = int(np.floor(size + 2 * 20 - 41) / 2 + 1)
    size = int(np.floor(size + 2 * 10 - 21) / 2 + 1)
    return size * 32


class TorchBatchNorm(nn.Module):
    """BatchNorm with exact torch semantics over the given reduction axes.

    Normalizes with biased variance; updates running_var with the unbiased
    estimate; momentum 0.1 (new = 0.9*old + 0.1*batch). Stats include padded
    (zeroed) positions, matching the reference which batch-norms the padded
    tensor (model.py:86,96 and the conv-stack BN under MaskConv).
    """

    num_features: int
    axes: Tuple[int, ...]          # reduction axes (all but the feature axis)
    eps: float = 1e-5
    momentum: float = 0.1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool) -> Array:
        feature_shape = [1] * x.ndim
        feat_axis = [a for a in range(x.ndim) if a not in self.axes]
        assert len(feat_axis) == 1
        feature_shape[feat_axis[0]] = self.num_features
        scale = self.param("scale", nn.initializers.ones, (self.num_features,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.num_features,), jnp.float32)
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((self.num_features,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((self.num_features,), jnp.float32))
        if train:
            xf = x.astype(jnp.float32)
            mean = jnp.mean(xf, axis=self.axes)
            var = jnp.mean(jnp.square(xf), axis=self.axes) - jnp.square(mean)
            n = np.prod([x.shape[a] for a in self.axes])
            if not self.is_initializing():
                ra_mean.value = (1 - self.momentum) * ra_mean.value + self.momentum * mean
                unbiased = var * (n / max(n - 1, 1))
                ra_var.value = (1 - self.momentum) * ra_var.value + self.momentum * unbiased
        else:
            mean, var = ra_mean.value, ra_var.value
        mean = mean.reshape(feature_shape).astype(self.dtype)
        inv = (jax.lax.rsqrt(var + self.eps)).reshape(feature_shape).astype(self.dtype)
        s = scale.reshape(feature_shape).astype(self.dtype)
        b = bias.reshape(feature_shape).astype(self.dtype)
        return (x.astype(self.dtype) - mean) * inv * s + b


def hardtanh_0_20(x: Array) -> Array:
    return jnp.clip(x, 0.0, 20.0)


class FastConv(nn.Module):
    """nn.Conv-compatible conv (same "kernel"/"bias" params, HWIO) routed
    through the banded-block formulation on TPU — XLA's backward pass for
    the reference's small-channel Conv2d shapes is ~20x off speed-of-light
    (see dsjax/ops/blockconv.py)."""

    features: int
    kernel_size: Tuple[int, int]
    strides: Tuple[int, int]
    padding: Tuple[Tuple[int, int], Tuple[int, int]]
    dtype: Any = jnp.float32
    block_j: int = 8

    @nn.compact
    def __call__(self, x: Array) -> Array:
        from dsjax.ops.blockconv import conv2d_auto

        kf, kt = self.kernel_size
        ci = x.shape[-1]
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (kf, kt, ci, self.features))
        bias = self.param("bias", nn.initializers.zeros_init(), (self.features,))
        y = conv2d_auto(x.astype(self.dtype), kernel.astype(self.dtype),
                        self.strides, self.padding, self.block_j)
        return y + bias.astype(y.dtype)


class ConvFrontend(nn.Module):
    """Two Conv2d+BN+Hardtanh blocks with per-module length masking.

    Layout is NHWC: (B, F, T, C) — channels-last is the TPU-friendly conv
    layout. Masking after every submodule reproduces MaskConv
    (reference: model.py:42-69): conv/BN outputs past each utterance's true
    (downsampled) length are zeroed so results are batch-size invariant.
    """

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, lengths: Array, train: bool) -> Tuple[Array, Array]:
        # x: (B, F, T, 1); lengths: (B,) input frame counts
        out_lengths = get_seq_lens(lengths)

        def time_mask(t_dim: int) -> Array:
            m = jnp.arange(t_dim)[None, :] < out_lengths[:, None]
            return m[:, None, :, None].astype(x.dtype)  # (B, 1, T', 1)

        x = FastConv(32, kernel_size=(41, 11), strides=(2, 2),
                     padding=((20, 20), (5, 5)), dtype=self.dtype,
                     block_j=8, name="conv1")(x)
        m = time_mask(x.shape[2])
        x = x * m
        x = TorchBatchNorm(32, axes=(0, 1, 2), dtype=self.dtype, name="bn1")(x, train)
        x = hardtanh_0_20(x) * m
        x = FastConv(32, kernel_size=(21, 11), strides=(2, 1),
                     padding=((10, 10), (5, 5)), dtype=self.dtype,
                     block_j=4, name="conv2")(x)
        m = time_mask(x.shape[2])
        x = x * m
        x = TorchBatchNorm(32, axes=(0, 1, 2), dtype=self.dtype, name="bn2")(x, train)
        x = hardtanh_0_20(x) * m
        return x, out_lengths


def _uniform_init(fan: int):
    """torch RNN default init: U(-1/sqrt(hidden), 1/sqrt(hidden))."""
    bound = 1.0 / np.sqrt(fan)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


@dataclasses.dataclass
class CellSpec:
    kind: RNNType
    gates: int          # gate multiplier: LSTM 4, GRU 3, RNN 1

    @staticmethod
    def of(kind: RNNType) -> "CellSpec":
        return CellSpec(kind, {"lstm": 4, "gru": 3, "rnn": 1}[kind.value])


class RecurrentLayer(nn.Module):
    """One (optionally bidirectional) recurrent layer with masked scan.

    Gate order matches torch for importability: LSTM (i, f, g, o), GRU
    (r, z, n). Bidirectional outputs are SUMMED, not concatenated
    (reference: model.py:101). Returns (y, carry_out) where carry_out holds
    the per-direction final hidden (and cell) state at each utterance's true
    end — the state torch's packed LSTM would return — enabling chunked
    streaming with state carry (reference: inference.py:86-96).
    """

    input_size: int
    hidden_size: int
    rnn_type: RNNType = RNNType.lstm
    bidirectional: bool = True
    dtype: Any = jnp.float32
    # None = auto (Pallas fused scan on TPU for LSTM); True/False force
    use_pallas: Optional[bool] = None

    def _pallas_enabled(self) -> bool:
        if self.rnn_type not in (RNNType.lstm, RNNType.gru):
            return False
        if self.use_pallas is not None:
            return self.use_pallas
        import jax as _jax

        return _jax.default_backend() == "tpu"

    @nn.compact
    def __call__(self, x: Array, lengths: Array,
                 carry_in: Optional[Dict[str, Array]] = None
                 ) -> Tuple[Array, Dict[str, Array]]:
        # x: (T, B, D) time-major; lengths: (B,)
        spec = CellSpec.of(self.rnn_type)
        t_dim, b_dim = x.shape[0], x.shape[1]
        h_sz, g = self.hidden_size, spec.gates
        init = _uniform_init(h_sz)
        # W_hh plus the double-buffered staging must fit VMEM (~16 MB/core).
        # The kernels stage two (2 x B x gH) streams (fwd: xp + saved
        # gates; bwd: gates + dgates) plus a few (B x H) buffers and
        # carries; this estimate upper-bounds both, and we fall back to
        # the lax.scan path when a big batch would blow the scoped-vmem
        # budget (measured: B=256 at H=1024 needs 23.6 MB and fails to
        # compile).
        itemsize = jnp.dtype(self.dtype).itemsize
        w_bytes = h_sz * g * h_sz * itemsize
        bwd_staging = b_dim * ((4 * g * h_sz + 6 * h_sz) * itemsize
                               + 2 * h_sz * 4)
        pallas_ok = (self._pallas_enabled()
                     and h_sz % 128 == 0 and b_dim % 8 == 0
                     and w_bytes + bwd_staging <= 15 * 1024 * 1024)

        def direction(name: str, xd: Array, mask: Array,
                      carry0: Tuple[Array, ...]) -> Tuple[Array, Tuple[Array, ...]]:
            w_ih = self.param(f"{name}_w_ih", init, (self.input_size, g * h_sz))
            w_hh = self.param(f"{name}_w_hh", init, (h_sz, g * h_sz))
            b_ih = self.param(f"{name}_b_ih", init, (g * h_sz,))
            b_hh = self.param(f"{name}_b_hh", init, (g * h_sz,))
            dt = self.dtype
            xd = xd.astype(dt)
            # one big MXU matmul for all timesteps' input projections
            xp = (xd.reshape(t_dim * b_dim, self.input_size) @ w_ih.astype(dt)
                  ).reshape(t_dim, b_dim, g * h_sz) + b_ih.astype(dt)
            mask = mask.astype(dt)  # (T, B)
            w_hh_c = w_hh.astype(dt)
            b_hh_c = b_hh.astype(dt)

            if spec.kind == RNNType.lstm and pallas_ok:
                from dsjax.ops.lstm_pallas import lstm_scan

                carry0 = tuple(c.astype(dt) for c in carry0)
                y, h_t, c_t = lstm_scan(xp, mask.astype(jnp.float32),
                                        w_hh_c, b_hh_c, carry0[0], carry0[1])
                return y, (h_t, c_t)

            if spec.kind == RNNType.gru and pallas_ok:
                from dsjax.ops.gru_pallas import gru_scan

                carry0 = tuple(c.astype(dt) for c in carry0)
                y, h_t = gru_scan(xp, mask.astype(jnp.float32),
                                  w_hh_c, b_hh_c, carry0[0])
                return y, (h_t,)

            if spec.kind == RNNType.lstm:
                def step(carry, inp):
                    h, c = carry
                    xp_t, m = inp
                    gates = xp_t + h @ w_hh_c + b_hh_c
                    i, f, gg, o = jnp.split(gates, 4, axis=-1)
                    i, f, o = jax.nn.sigmoid(i), jax.nn.sigmoid(f), jax.nn.sigmoid(o)
                    gg = jnp.tanh(gg)
                    c_new = f * c + i * gg
                    h_new = o * jnp.tanh(c_new)
                    m1 = m[:, None]
                    h = m1 * h_new + (1 - m1) * h
                    c = m1 * c_new + (1 - m1) * c
                    return (h, c), h_new * m1
            elif spec.kind == RNNType.gru:
                def step(carry, inp):
                    (h,) = carry
                    xp_t, m = inp
                    hp = h @ w_hh_c + b_hh_c
                    xr, xz, xn = jnp.split(xp_t, 3, axis=-1)
                    hr, hz, hn = jnp.split(hp, 3, axis=-1)
                    r = jax.nn.sigmoid(xr + hr)
                    z = jax.nn.sigmoid(xz + hz)
                    n_ = jnp.tanh(xn + r * hn)
                    h_new = (1 - z) * n_ + z * h
                    m1 = m[:, None]
                    h = m1 * h_new + (1 - m1) * h
                    return (h,), h_new * m1
            else:  # vanilla tanh RNN
                def step(carry, inp):
                    (h,) = carry
                    xp_t, m = inp
                    h_new = jnp.tanh(xp_t + h @ w_hh_c + b_hh_c)
                    m1 = m[:, None]
                    h = m1 * h_new + (1 - m1) * h
                    return (h,), h_new * m1

            carry0 = tuple(c.astype(dt) for c in carry0)
            carry_out, y = jax.lax.scan(step, carry0, (xp, mask))
            return y, carry_out

        def zeros_carry() -> Tuple[Array, ...]:
            n_state = 2 if spec.kind == RNNType.lstm else 1
            return tuple(jnp.zeros((b_dim, h_sz), self.dtype) for _ in range(n_state))

        def carry_for(name: str) -> Tuple[Array, ...]:
            if carry_in is None or name not in carry_in:
                return zeros_carry()
            v = carry_in[name]
            return tuple(v) if isinstance(v, (tuple, list)) else (v,)

        mask_fwd = jnp.arange(t_dim)[:, None] < lengths[None, :]
        y_fwd, c_fwd = direction("fwd", x, mask_fwd, carry_for("fwd"))
        carry_out: Dict[str, Any] = {"fwd": c_fwd}
        y = y_fwd
        if self.bidirectional:
            # Gather-free length-aware reversal: flip the WHOLE padded array
            # (lax.rev — a fast layout op, no element-gather) and flip the
            # mask with it. Each sequence's valid frames now occupy
            # [T-len, T); the masked carry idles through the leading padding
            # (m=0 keeps h0/c0), so the scan semantics match a per-length
            # reversal exactly, and flipping the output re-aligns it.
            xr = jnp.flip(x, axis=0)
            mask_bwd = jnp.flip(mask_fwd, axis=0)
            y_bwd_r, c_bwd = direction("bwd", xr, mask_bwd, carry_for("bwd"))
            y_bwd = jnp.flip(y_bwd_r, axis=0)
            # y_bwd is already zero-masked past each length by the scan
            y = y_fwd + y_bwd
            carry_out["bwd"] = c_bwd
        return y, carry_out


class Lookahead(nn.Module):
    """Depthwise causal-future conv over time (Wang et al. 2016;
    reference: model.py:105-135): y[t] = sum_j w[f, j] * x[t+j, f],
    right-padded context-1, no bias."""

    n_features: int
    context: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        # x: (T, B, F) -> depthwise conv over T with future window
        w = self.param("weight", nn.initializers.kaiming_uniform(),
                       (self.n_features, self.context))
        xt = jnp.transpose(x, (1, 0, 2)).astype(self.dtype)  # (B, T, F)
        xt = jnp.pad(xt, ((0, 0), (0, self.context - 1), (0, 0)))
        # (B, T+c-1, F) depthwise conv: kernel (c, 1, F) feature_group_count=F
        kernel = w.T[:, None, :].astype(self.dtype)  # (c, 1, F) HIO-ish
        y = jax.lax.conv_general_dilated(
            xt, kernel,
            window_strides=(1,), padding="VALID",
            dimension_numbers=("NHC", "HIO", "NHC"),
            feature_group_count=self.n_features,
        )
        return jnp.transpose(y, (1, 0, 2))


class DeepSpeech2(nn.Module):
    """Full DS2 network: conv frontend -> recurrent stack -> FC head.

    __call__ takes (B, F, T) spectrograms + frame lengths and returns
    (logits_or_probs (B, T', C), out_lengths (B,), carry) exactly mirroring
    the reference forward contract (model.py:214-239): outputs are raw
    logits in training mode and softmax probabilities in eval mode.
    """

    num_classes: int
    spect_cfg: SpectConfig
    model_cfg: BiDirectionalConfig
    dtype: Any = jnp.float32
    use_pallas: Optional[bool] = None  # None = auto (fused LSTM scan on TPU)

    @property
    def bidirectional(self) -> bool:
        return not isinstance(self.model_cfg, UniDirectionalConfig)

    @nn.compact
    def __call__(self, x: Array, lengths: Array,
                 carry: Optional[List[Dict[str, Array]]] = None,
                 train: bool = False) -> Tuple[Array, Array, List[Dict[str, Array]]]:
        if x.ndim == 4:  # accept (B, 1, F, T) reference layout
            x = x[:, 0]
        b_dim = x.shape[0]
        x = x[..., None].astype(self.dtype)                    # (B, F, T, 1)
        x, out_lengths = ConvFrontend(dtype=self.dtype, name="conv")(x, lengths, train)
        # (B, F', T', C) -> feature index c*F'+f to match reference
        # view(B, C*F', T) flattening (model.py:219-221)
        x = jnp.transpose(x, (2, 0, 3, 1))                     # (T', B, C, F')
        x = x.reshape(x.shape[0], b_dim, -1)                   # (T', B, C*F')

        h = self.model_cfg.hidden_size
        n_layers = self.model_cfg.hidden_layers
        new_carry: List[Dict[str, Array]] = []
        in_size = x.shape[-1]
        for i in range(n_layers):
            if i > 0:
                x = TorchBatchNorm(in_size, axes=(0, 1), dtype=self.dtype,
                                   name=f"rnn{i}_bn")(x, train)
            layer_carry = carry[i] if carry is not None else None
            x, c = RecurrentLayer(
                input_size=in_size, hidden_size=h,
                rnn_type=self.model_cfg.rnn_type,
                bidirectional=self.bidirectional,
                dtype=self.dtype, use_pallas=self.use_pallas,
                name=f"rnn{i}")(x, out_lengths, layer_carry)
            new_carry.append(c)
            in_size = h

        if not self.bidirectional:
            x = Lookahead(h, self.model_cfg.lookahead_context,
                          dtype=self.dtype, name="lookahead")(x)
            x = hardtanh_0_20(x)

        x = TorchBatchNorm(h, axes=(0, 1), dtype=self.dtype, name="fc_bn")(x, train)
        x = nn.Dense(self.num_classes, use_bias=False, dtype=self.dtype, name="fc")(x)
        x = jnp.transpose(x, (1, 0, 2))                        # (B, T', C)
        if not train:
            x = jax.nn.softmax(x.astype(jnp.float32), axis=-1)
        return x, out_lengths, new_carry


def init_model(model: DeepSpeech2, rng: jax.Array, batch: int = 2, frames: int = 64
               ) -> Dict[str, Any]:
    """Initialize parameters + batch stats with dummy shapes (jitted so the
    whole init is one compiled program instead of per-op dispatches)."""
    n_freq = int(model.spect_cfg.sample_rate * model.spect_cfg.window_size) // 2 + 1
    x = jnp.zeros((batch, n_freq, frames), jnp.float32)
    lengths = jnp.full((batch,), frames, jnp.int32)
    return jax.jit(lambda r: model.init(r, x, lengths, train=False))(rng)
