"""Fused Pallas int8 dense kernel (ops/pallas_qdense.py).

The kernel must be numerically IDENTICAL to the XLA int8 lowering
(models/layers.py::_int8_matmul) — same quant contract
(symmetric_int8 per-row / quant_static per-tensor), same int32
accumulate, same dequant — so switching ``stage{1,2,3}_act_int8`` to
its ``*pallas`` variants can never move rankings relative to the XLA
int8 modes. On CPU the kernel runs in interpreter mode; tile/grid
logic is identical to the compiled TPU path.
"""

from __future__ import annotations

import numpy as np
import pytest


def _mk(m, k, n, seed=0):
    import jax.numpy as jnp

    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((m, k)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((k, n)) * 0.05, jnp.float32)
    b = jnp.asarray(rng.standard_normal((n,)), jnp.float32)
    return x, w, b


def _wq(w):
    from tristage_rag_tpu.index.token_cache import symmetric_int8

    wq_nk, ws = symmetric_int8(w.T)
    return wq_nk.T, ws


class TestKernelVsXLA:
    def test_dynamic_matches_xla_path(self):
        import jax.numpy as jnp

        from tristage_rag_tpu.models.layers import _int8_matmul
        from tristage_rag_tpu.ops.pallas_qdense import fused_qdense

        x, w, b = _mk(96, 128, 256)
        wq, ws = _wq(w)
        ref = np.asarray(_int8_matmul(x, w, jnp.float32)) + np.asarray(b)
        got = np.asarray(fused_qdense(
            x, wq, ws, bias=b, out_dtype=jnp.float32, interpret=True
        ))
        np.testing.assert_allclose(got, ref, atol=1e-4)

    def test_static_matches_xla_path(self):
        import jax.numpy as jnp

        from tristage_rag_tpu.models.layers import _int8_matmul, quant_static
        from tristage_rag_tpu.ops.pallas_qdense import fused_qdense

        x, w, b = _mk(64, 256, 128, seed=1)
        wq, ws = _wq(w)
        s = jnp.float32(float(jnp.max(jnp.abs(x))) / 127.0)
        ref = np.asarray(
            _int8_matmul(x, w, jnp.float32, pre=quant_static(x, s))
        ) + np.asarray(b)
        got = np.asarray(fused_qdense(
            x, wq, ws, bias=b, x_scale=s, out_dtype=jnp.float32,
            interpret=True,
        ))
        np.testing.assert_allclose(got, ref, atol=1e-4)

    def test_ragged_m_padding_and_no_bias(self):
        import jax.numpy as jnp

        from tristage_rag_tpu.models.layers import _int8_matmul
        from tristage_rag_tpu.ops.pallas_qdense import fused_qdense

        # M=37 forces an in-wrapper pad to the 32-sublane tile
        x, w, _ = _mk(37, 128, 128, seed=2)
        wq, ws = _wq(w)
        ref = np.asarray(_int8_matmul(x, w, jnp.float32))
        got = np.asarray(
            fused_qdense(x, wq, ws, out_dtype=jnp.float32, interpret=True)
        )
        assert got.shape == (37, 128)
        np.testing.assert_allclose(got, ref, atol=1e-4)

    @pytest.mark.parametrize("act", ["relu", "gelu", "gelu_tanh", "silu"])
    def test_fused_activation_epilogues(self, act):
        import jax
        import jax.numpy as jnp

        from tristage_rag_tpu.models.layers import _int8_matmul
        from tristage_rag_tpu.ops.pallas_qdense import fused_qdense

        fns = {
            "relu": lambda y: jnp.maximum(y, 0.0),
            "gelu": lambda y: jax.nn.gelu(y, approximate=False),
            "gelu_tanh": lambda y: jax.nn.gelu(y, approximate=True),
            "silu": jax.nn.silu,
        }
        x, w, b = _mk(32, 128, 128, seed=3)
        wq, ws = _wq(w)
        ref = fns[act](_int8_matmul(x, w, jnp.float32) + b)
        got = fused_qdense(
            x, wq, ws, bias=b, act=act, out_dtype=jnp.float32,
            interpret=True,
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), atol=1e-4
        )

    def test_bf16_output_dtype(self):
        import jax.numpy as jnp

        from tristage_rag_tpu.ops.pallas_qdense import fused_qdense

        x, w, b = _mk(32, 128, 128, seed=4)
        wq, ws = _wq(w)
        got = fused_qdense(x, wq, ws, bias=b, interpret=True)
        assert got.dtype == jnp.bfloat16

    def test_n_tiling_matches_untiled(self):
        import jax.numpy as jnp

        from tristage_rag_tpu.ops.pallas_qdense import fused_qdense

        x, w, _ = _mk(32, 128, 512, seed=5)
        wq, ws = _wq(w)
        whole = fused_qdense(x, wq, ws, out_dtype=jnp.float32,
                             interpret=True)
        # force the N grid by shrinking the VMEM budget through a tiny
        # block_m (same kernel, multiple j programs per i)
        import tristage_rag_tpu.ops.pallas_qdense as mod

        orig = mod._pick_block_n
        mod._pick_block_n = lambda k, n, vmem_cap=0: 128
        try:
            tiled = fused_qdense(x, wq, ws, out_dtype=jnp.float32,
                                 block_m=32, interpret=True)
        finally:
            mod._pick_block_n = orig
        np.testing.assert_allclose(
            np.asarray(tiled), np.asarray(whole), atol=1e-5
        )

    def test_unaligned_shapes_refused(self):
        import jax.numpy as jnp

        from tristage_rag_tpu.ops.pallas_qdense import fused_qdense

        x, w, _ = _mk(16, 48, 128, seed=6)
        wq, ws = _wq(w)
        with pytest.raises(ValueError, match="128"):
            fused_qdense(x, wq, ws, out_dtype=jnp.float32, interpret=True)


class TestQDenseRouting:
    def test_qdense_kernel_matches_xla_reference(self):
        """QDense is kernel-first since the XLA act-int8 modes were
        pruned (VERDICT r3 next-7); its output must match the explicit
        XLA int8 reference (_int8_matmul) within kernel/XLA float
        tolerance at aligned shapes."""
        import jax
        import jax.numpy as jnp
        import flax.linen as nn

        from tristage_rag_tpu.models.layers import QDense, _int8_matmul

        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal((40, 128)), jnp.float32)
        p = nn.Dense(features=256).init(jax.random.PRNGKey(1), x)
        kernel = p["params"]["kernel"]
        bias = p["params"]["bias"]
        y_ref = np.asarray(
            _int8_matmul(x, kernel, jnp.float32) + bias
        )
        y_q = np.asarray(QDense(features=256).apply(p, x))
        np.testing.assert_allclose(y_q, y_ref, atol=1e-4)

    def test_qdense_unaligned_falls_back_to_xla(self):
        """At lane-misaligned shapes the kernel refuses and QDense must
        take the XLA fallback EXACTLY (bit-equal to _int8_matmul)."""
        import jax
        import jax.numpy as jnp
        import flax.linen as nn

        from tristage_rag_tpu.models.layers import QDense, _int8_matmul

        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.standard_normal((8, 48)), jnp.float32)
        p = nn.Dense(features=12).init(jax.random.PRNGKey(1), x)
        y_ref = np.asarray(
            _int8_matmul(x, p["params"]["kernel"], jnp.float32)
            + p["params"]["bias"]
        )
        y_q = np.asarray(QDense(features=12).apply(p, x))
        np.testing.assert_allclose(y_q, y_ref, atol=1e-6)

    def test_qdense_general_matches_xla_reference(self):
        import jax
        import jax.numpy as jnp
        import flax.linen as nn

        from tristage_rag_tpu.models.layers import (
            QDenseGeneral, _int8_matmul,
        )

        rng = np.random.default_rng(2)
        x = jnp.asarray(rng.standard_normal((4, 8, 128)), jnp.float32)
        p = nn.DenseGeneral(features=(2, 64)).init(jax.random.PRNGKey(0), x)
        kern2d = p["params"]["kernel"].reshape(128, 128)
        bias = p["params"]["bias"].reshape(-1)
        y_ref = np.asarray(
            _int8_matmul(x.reshape(-1, 128), kern2d, jnp.float32) + bias
        ).reshape(4, 8, 2, 64)
        y_q = np.asarray(QDenseGeneral(features=(2, 64)).apply(p, x))
        np.testing.assert_allclose(y_q, y_ref, atol=1e-4)


class TestEncoderLayerParity:
    """A lane-aligned one-layer encoder: static-pallas must match
    static-XLA exactly (same sites quantize, same math); dynamic-pallas
    must stay within quant error of bf16 (it quantizes MORE sites than
    dynamic-XLA — o_proj/down_proj — by design)."""

    def _layer_cfg(self, **extra):
        from tristage_rag_tpu.models.config import EncoderConfig

        return EncoderConfig(
            vocab_size=128, hidden_size=128, num_layers=1, num_heads=2,
            head_dim=64, mlp_dim=256, max_position_embeddings=32,
            dtype="float32", **extra,
        )

    def _run(self, cfg, params=None):
        import jax
        import jax.numpy as jnp

        from tristage_rag_tpu.models.layers import EncoderLayer, attention_bias

        rng = np.random.default_rng(7)
        x = jnp.asarray(rng.standard_normal((2, 8, 128)) * 0.1, jnp.float32)
        mask = jnp.ones((2, 8), jnp.int32)
        bias = attention_bias(mask)
        layer = EncoderLayer(cfg, 0)
        if params is None:
            params = layer.init(jax.random.PRNGKey(0), x, bias, None, None)
        return np.asarray(layer.apply(params, x, bias, None, None)), params

    # NOTE: the former layer-level "static-pallas vs static-XLA" test
    # became a self-comparison when the XLA modes were pruned (VERDICT
    # r3 next-7) and was removed: meaningful static-mode numerics need
    # CALIBRATED scales, which only exist at runtime level — covered by
    # tests/test_int8_act_static.py and
    # test_kernel_stack_pipeline.py::test_static_pallas_close_to_bf16.

    def test_param_tree_identical_across_modes(self):
        """bf16 and int8-kernel (fused QKV + fused MLP) must produce
        the same param tree so checkpoints swap freely. (Static mode
        differs BY DESIGN: it adds the calibrated *_scale leaves.)"""
        import jax
        import jax.numpy as jnp

        from tristage_rag_tpu.models.layers import EncoderLayer, attention_bias

        x = jnp.ones((1, 4, 128), jnp.float32)
        bias = attention_bias(jnp.ones((1, 4), jnp.int32))
        trees = []
        for extra in (
            {},
            {"int8_activations": True},
        ):
            p = EncoderLayer(self._layer_cfg(**extra), 0).init(
                jax.random.PRNGKey(0), x, bias, None, None
            )
            trees.append(p)
        s0 = jax.tree_util.tree_structure(trees[0])
        for t in trees[1:]:
            assert jax.tree_util.tree_structure(t) == s0
        for leaves in zip(*(jax.tree_util.tree_leaves(t) for t in trees)):
            # same structure AND same init values (same seed)
            for other in leaves[1:]:
                np.testing.assert_array_equal(
                    np.asarray(leaves[0]), np.asarray(other)
                )

    def test_dynamic_pallas_close_to_bf16(self):
        y_ref, params = self._run(self._layer_cfg())
        y_pal, _ = self._run(self._layer_cfg(
            int8_activations=True,
        ), params=params)
        denom = max(np.abs(y_ref).max(), 1e-6)
        assert np.abs(y_pal - y_ref).max() / denom < 0.05


class TestFusedMlp:
    """fused_qmlp: the whole gate/up/act/mul/down block in one kernel.
    Must match the per-projection XLA int8 composition exactly."""

    def _parts(self, k=128, f=256, m=70, seed=0):
        import jax.numpy as jnp

        from tristage_rag_tpu.index.token_cache import symmetric_int8

        rng = np.random.default_rng(seed)
        x = jnp.asarray(rng.standard_normal((m, k)) * 0.3, jnp.float32)

        def q(w):
            qnk, s = symmetric_int8(jnp.asarray(w, jnp.float32).T)
            return jnp.asarray(w, jnp.float32), qnk.T, s

        Wg, wg, gs = q(rng.standard_normal((k, f)) * 0.1)
        Wu, wu, us = q(rng.standard_normal((k, f)) * 0.1)
        Wd, wd, ds = q(rng.standard_normal((f, k)) * 0.1)
        bg, bu, bd = (
            jnp.asarray(rng.standard_normal(n), jnp.float32)
            for n in (f, f, k)
        )
        return x, (Wg, wg, gs, bg), (Wu, wu, us, bu), (Wd, wd, ds, bd)

    def test_glu_dynamic_matches_xla_composition(self):
        import jax
        import jax.numpy as jnp

        from tristage_rag_tpu.models.layers import _int8_matmul
        from tristage_rag_tpu.ops.pallas_qdense import fused_qmlp

        x, (Wg, wg, gs, bg), (Wu, wu, us, bu), (Wd, wd, ds, bd) = self._parts()
        g = _int8_matmul(x, Wg, jnp.float32) + bg
        u = _int8_matmul(x, Wu, jnp.float32) + bu
        h = jax.nn.gelu(g, approximate=False) * u
        ref = _int8_matmul(h, Wd, jnp.float32) + bd
        got = fused_qmlp(
            x, wg, wu, wd, gs, us, ds, bg, bu, bd,
            act="gelu", glu=True, out_dtype=jnp.float32, interpret=True,
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), atol=1e-4
        )

    def test_glu_static_matches_xla_composition(self):
        import jax
        import jax.numpy as jnp

        from tristage_rag_tpu.models.layers import _int8_matmul, quant_static
        from tristage_rag_tpu.ops.pallas_qdense import fused_qmlp

        x, (Wg, wg, gs, bg), (Wu, wu, us, bu), (Wd, wd, ds, bd) = self._parts(
            seed=1
        )
        sx = jnp.float32(float(jnp.max(jnp.abs(x))) / 127.0)
        g = _int8_matmul(x, Wg, jnp.float32, pre=quant_static(x, sx)) + bg
        u = _int8_matmul(x, Wu, jnp.float32, pre=quant_static(x, sx)) + bu
        h = jax.nn.gelu(g, approximate=True) * u
        sh = jnp.float32(float(jnp.max(jnp.abs(h))) / 127.0)
        ref = _int8_matmul(h, Wd, jnp.float32, pre=quant_static(h, sh)) + bd
        got = fused_qmlp(
            x, wg, wu, wd, gs, us, ds, bg, bu, bd, x_scale=sx, h_scale=sh,
            act="gelu_tanh", glu=True, out_dtype=jnp.float32, interpret=True,
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), atol=1e-4
        )

    def test_plain_mlp_matches_xla_composition(self):
        import jax
        import jax.numpy as jnp

        from tristage_rag_tpu.models.layers import _int8_matmul
        from tristage_rag_tpu.ops.pallas_qdense import fused_qmlp

        x, (Wg, wg, gs, bg), _, (Wd, wd, ds, bd) = self._parts(seed=2)
        h = jax.nn.gelu(_int8_matmul(x, Wg, jnp.float32) + bg,
                        approximate=False)
        ref = _int8_matmul(h, Wd, jnp.float32) + bd
        got = fused_qmlp(
            x, wg, None, wd, gs, None, ds, bg, None, bd,
            act="gelu", glu=False, out_dtype=jnp.float32, interpret=True,
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), atol=1e-4
        )

    def test_mlp_module_param_tree_unchanged(self):
        import jax
        import jax.numpy as jnp

        from tristage_rag_tpu.models.config import EncoderConfig
        from tristage_rag_tpu.models.layers import Mlp

        base = dict(
            vocab_size=128, hidden_size=128, num_layers=1, num_heads=2,
            head_dim=64, mlp_dim=256, max_position_embeddings=32,
            dtype="float32", activation="geglu",
        )
        x = jnp.ones((2, 4, 128), jnp.float32)
        p_ref = Mlp(EncoderConfig(**base)).init(jax.random.PRNGKey(0), x)
        p_pal = Mlp(EncoderConfig(
            **base, int8_activations=True,
        )).init(jax.random.PRNGKey(0), x)
        assert (
            jax.tree_util.tree_structure(p_ref)
            == jax.tree_util.tree_structure(p_pal)
        )
        for a, b in zip(
            jax.tree_util.tree_leaves(p_ref), jax.tree_util.tree_leaves(p_pal)
        ):
            assert a.shape == b.shape

    def test_mlp_module_fused_close_to_bf16(self):
        import jax
        import jax.numpy as jnp

        from tristage_rag_tpu.models.config import EncoderConfig
        from tristage_rag_tpu.models.layers import Mlp

        base = dict(
            vocab_size=128, hidden_size=128, num_layers=1, num_heads=2,
            head_dim=64, mlp_dim=256, max_position_embeddings=32,
            dtype="float32", activation="geglu_tanh",
        )
        rng = np.random.default_rng(3)
        x = jnp.asarray(rng.standard_normal((2, 8, 128)) * 0.1, jnp.float32)
        m_ref = Mlp(EncoderConfig(**base))
        params = m_ref.init(jax.random.PRNGKey(0), x)
        y_ref = np.asarray(m_ref.apply(params, x))
        y_pal = np.asarray(Mlp(EncoderConfig(
            **base, int8_activations=True,
        )).apply(params, x))
        denom = max(np.abs(y_ref).max(), 1e-6)
        assert np.abs(y_pal - y_ref).max() / denom < 0.05


class TestFusedMlpBf16:
    """fused_mlp_bf16: the whole-block fusion at the native dtype —
    no quantization, opt-in via stage{1,2,3}_fused_mlp."""

    def test_kernel_matches_composition_f32(self):
        import jax
        import jax.numpy as jnp

        rng = np.random.default_rng(0)
        from tristage_rag_tpu.ops.pallas_qdense import fused_mlp_bf16

        x = jnp.asarray(rng.standard_normal((70, 128)) * 0.3, jnp.float32)
        wg = jnp.asarray(rng.standard_normal((128, 256)) * 0.1, jnp.float32)
        wu = jnp.asarray(rng.standard_normal((128, 256)) * 0.1, jnp.float32)
        wd = jnp.asarray(rng.standard_normal((256, 128)) * 0.1, jnp.float32)
        bg, bu, bd = (
            jnp.asarray(rng.standard_normal(n), jnp.float32)
            for n in (256, 256, 128)
        )
        h = jax.nn.gelu(x @ wg + bg, approximate=True) * (x @ wu + bu)
        ref = h @ wd + bd
        got = fused_mlp_bf16(
            x, wg, wu, wd, bg, bu, bd, act="gelu_tanh", glu=True,
            out_dtype=jnp.float32, interpret=True,
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), atol=1e-4
        )

    @pytest.mark.parametrize("glu", [True, False])
    def test_int8_weights_match_dequant_composition(self, glu):
        # weight-only int8 (sg/su/sd given): the kernel dequantizes
        # weight tiles in VMEM and folds the per-channel scale into
        # the f32 accumulator — must match dequant-then-compose
        import jax
        import jax.numpy as jnp

        from tristage_rag_tpu.models.runtime import _quantize_kernel
        from tristage_rag_tpu.ops.pallas_qdense import fused_mlp_bf16

        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.standard_normal((40, 128)) * 0.3, jnp.float32)
        wg = rng.standard_normal((128, 256)).astype(np.float32) * 0.1
        wu = rng.standard_normal((128, 256)).astype(np.float32) * 0.1
        wd = rng.standard_normal((256, 128)).astype(np.float32) * 0.1
        bg, bu, bd = (
            jnp.asarray(rng.standard_normal(n) * 0.01, jnp.float32)
            for n in (256, 256, 128)
        )
        qg, qu, qd = map(_quantize_kernel, (wg, wu, wd))
        deq = lambda q: jnp.asarray(
            q["q8"].astype(np.float32) * q["scale"], jnp.float32
        )
        h = x @ deq(qg) + bg
        h = jax.nn.silu(h) * (x @ deq(qu) + bu) if glu else jax.nn.relu(h)
        ref = h @ deq(qd) + bd
        got = fused_mlp_bf16(
            x, jnp.asarray(qg["q8"]),
            jnp.asarray(qu["q8"]) if glu else None, jnp.asarray(qd["q8"]),
            bg, bu if glu else None, bd,
            sg=jnp.asarray(qg["scale"]),
            su=jnp.asarray(qu["scale"]) if glu else None,
            sd=jnp.asarray(qd["scale"]),
            act="silu" if glu else "relu", glu=glu,
            out_dtype=jnp.float32, interpret=True,
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), atol=2e-4
        )

    def test_post_ln_epilogue_matches_composition(self):
        # out = LN(x + mlp(x)) folded into the kernel (stats in f32,
        # fast-variance) must match the explicit composition
        import jax
        import jax.numpy as jnp

        from tristage_rag_tpu.ops.pallas_qdense import fused_mlp_bf16

        rng = np.random.default_rng(3)
        x = jnp.asarray(rng.standard_normal((24, 128)) * 0.3, jnp.float32)
        wg = jnp.asarray(rng.standard_normal((128, 256)) * 0.1, jnp.float32)
        wd = jnp.asarray(rng.standard_normal((256, 128)) * 0.1, jnp.float32)
        bg = jnp.asarray(rng.standard_normal(256) * 0.01, jnp.float32)
        bd = jnp.asarray(rng.standard_normal(128) * 0.01, jnp.float32)
        lns = jnp.asarray(1.0 + rng.standard_normal(128) * 0.1, jnp.float32)
        lnb = jnp.asarray(rng.standard_normal(128) * 0.1, jnp.float32)
        eps = 1e-12
        z = x + (jax.nn.relu(x @ wg + bg) @ wd + bd)
        mu = z.mean(-1, keepdims=True)
        var = (z * z).mean(-1, keepdims=True) - mu * mu
        ref = (z - mu) * jax.lax.rsqrt(var + eps) * lns + lnb
        got = fused_mlp_bf16(
            x, wg, None, wd, bg, None, bd,
            ln_scale=lns, ln_bias=lnb, ln_eps=eps,
            act="relu", glu=False, out_dtype=jnp.float32, interpret=True,
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), atol=2e-4
        )
        # no-bias variant (use_bias=False encoders)
        got_nb = fused_mlp_bf16(
            x, wg, None, wd, bg, None, bd,
            ln_scale=lns, ln_bias=None, ln_eps=eps,
            act="relu", glu=False, out_dtype=jnp.float32, interpret=True,
        )
        ref_nb = (z - mu) * jax.lax.rsqrt(var + eps) * lns
        np.testing.assert_allclose(
            np.asarray(got_nb), np.asarray(ref_nb), atol=2e-4
        )

    def test_pre_norm_prologue_matches_composition(self):
        # pre-LN encoders: out = x + [post_rms](mlp(norm(x))) folded
        # into the kernel — both the ModernBERT (ln, no post) and the
        # Gemma (rms + unit offset, post_mlp_norm) shapes
        import jax
        import jax.numpy as jnp

        from tristage_rag_tpu.ops.pallas_qdense import fused_mlp_bf16

        rng = np.random.default_rng(4)
        x = jnp.asarray(rng.standard_normal((16, 128)) * 0.5, jnp.float32)
        wg = jnp.asarray(rng.standard_normal((128, 256)) * 0.1, jnp.float32)
        wu = jnp.asarray(rng.standard_normal((128, 256)) * 0.1, jnp.float32)
        wd = jnp.asarray(rng.standard_normal((256, 128)) * 0.1, jnp.float32)
        ps = jnp.asarray(1.0 + rng.standard_normal(128) * 0.1, jnp.float32)
        pb = jnp.asarray(rng.standard_normal(128) * 0.1, jnp.float32)
        prs = jnp.asarray(rng.standard_normal(128) * 0.1, jnp.float32)
        eps = 1e-5

        def mlp(z):
            return (jax.nn.gelu(z @ wg, approximate=True)
                    * (z @ wu)) @ wd

        # ModernBERT shape: ln prologue + residual
        mu = x.mean(-1, keepdims=True)
        var = (x * x).mean(-1, keepdims=True) - mu * mu
        xn = (x - mu) * jax.lax.rsqrt(var + eps) * ps + pb
        ref = x + mlp(xn)
        got = fused_mlp_bf16(
            x, wg, wu, wd, pre_kind="ln", pre_scale=ps, pre_bias=pb,
            residual=True, ln_eps=eps, act="gelu_tanh", glu=True,
            out_dtype=jnp.float32, interpret=True,
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), atol=3e-4
        )
        # Gemma shape: rms(unit-offset) prologue + post rms + residual
        rv = (x * x).mean(-1, keepdims=True)
        xn = x * jax.lax.rsqrt(rv + eps) * (1.0 + ps)
        y = mlp(xn)
        yv = (y * y).mean(-1, keepdims=True)
        ref = x + y * jax.lax.rsqrt(yv + eps) * (1.0 + prs)
        got = fused_mlp_bf16(
            x, wg, wu, wd, pre_kind="rms", pre_scale=ps,
            post_rms_scale=prs, residual=True, ln_eps=eps,
            act="gelu_tanh", glu=True, out_dtype=jnp.float32,
            interpret=True,
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), atol=3e-4
        )

    @pytest.mark.parametrize("family", ["gemma", "modernbert"])
    def test_pre_norm_encoder_forward_matches_module_path(self, family):
        # whole pre-LN encoders with the norm folding vs the module
        # path: same params, outputs within tolerance, trees identical
        import jax

        from tristage_rag_tpu.models.registry import encoder_config
        from tristage_rag_tpu.models.encoder import TextEncoder

        base = encoder_config(f"tiny-{family}-aligned")
        mk = lambda fused: base.replace(dtype="float32", fused_mlp=fused)
        ids = np.array([[1, 5, 9, 3, 2, 7, 4, 6]], np.int32)
        mask = np.array([[1, 1, 1, 1, 1, 1, 0, 0]], np.int32)
        ma, mb = TextEncoder(mk(False)), TextEncoder(mk(True))
        rng = jax.random.PRNGKey(0)
        pa = ma.init(rng, ids, mask)["params"]
        pb = mb.init(rng, ids, mask)["params"]
        assert jax.tree_util.tree_structure(pa) == (
            jax.tree_util.tree_structure(pb)
        )
        oa = ma.apply({"params": pa}, ids, mask)
        ob = mb.apply({"params": pa}, ids, mask)
        np.testing.assert_allclose(
            np.asarray(oa, np.float32), np.asarray(ob, np.float32),
            atol=5e-3, rtol=5e-3,
        )

    def test_post_ln_requires_square(self):
        import jax.numpy as jnp

        from tristage_rag_tpu.ops.pallas_qdense import fused_mlp_bf16

        with pytest.raises(ValueError, match="K == N"):
            fused_mlp_bf16(
                jnp.zeros((8, 128), jnp.float32),
                jnp.zeros((128, 256), jnp.float32), None,
                jnp.zeros((256, 256), jnp.float32),
                ln_scale=jnp.ones(256, jnp.float32),
                act="relu", glu=False, interpret=True,
            )

    def test_post_ln_encoder_forward_matches_module_path(self):
        # the whole post-LN encoder (BERT-style) with the LN folded
        # into the kernel vs the pure module path: same params, outputs
        # within bf16 tolerance; param trees identical
        import jax
        import jax.numpy as jnp

        from tristage_rag_tpu.models.config import EncoderConfig
        from tristage_rag_tpu.models.encoder import TextEncoder

        mk = lambda fused: EncoderConfig(
            vocab_size=64, hidden_size=128, num_layers=2, num_heads=2,
            mlp_dim=256, max_position_embeddings=32, dtype="float32",
            activation="gelu", fused_mlp=fused,
        )
        ids = np.array([[1, 5, 9, 3, 0, 0, 0, 0]], np.int32)
        mask = np.array([[1, 1, 1, 1, 0, 0, 0, 0]], np.int32)
        ma, mb = TextEncoder(mk(False)), TextEncoder(mk(True))
        rng = jax.random.PRNGKey(0)
        pa = ma.init(rng, ids, mask)["params"]
        pb = mb.init(rng, ids, mask)["params"]
        assert jax.tree_util.tree_structure(pa) == (
            jax.tree_util.tree_structure(pb)
        )
        oa = ma.apply({"params": pa}, ids, mask)
        ob = mb.apply({"params": pa}, ids, mask)
        np.testing.assert_allclose(
            np.asarray(oa, np.float32), np.asarray(ob, np.float32),
            atol=5e-3, rtol=5e-3,
        )

    def test_int8_weights_need_all_scales(self):
        import jax.numpy as jnp

        from tristage_rag_tpu.models.runtime import _quantize_kernel
        from tristage_rag_tpu.ops.pallas_qdense import fused_mlp_bf16

        rng = np.random.default_rng(2)
        x = jnp.zeros((8, 128), jnp.float32)
        qg = _quantize_kernel(rng.standard_normal((128, 256)).astype(np.float32))
        qd = _quantize_kernel(rng.standard_normal((256, 128)).astype(np.float32))
        with pytest.raises(ValueError, match="scales for every"):
            fused_mlp_bf16(
                x, jnp.asarray(qg["q8"]), None, jnp.asarray(qd["q8"]),
                sg=jnp.asarray(qg["scale"]), glu=False, interpret=True,
            )
        with pytest.raises(ValueError, match="not int8"):
            fused_mlp_bf16(
                x, jnp.asarray(qg["q8"], jnp.float32), None,
                jnp.asarray(qd["q8"], jnp.float32),
                sg=jnp.asarray(qg["scale"]), sd=jnp.asarray(qd["scale"]),
                glu=False, interpret=True,
            )

    def test_mlp_module_fused_matches_plain_f32(self):
        import jax
        import jax.numpy as jnp

        from tristage_rag_tpu.models.config import EncoderConfig
        from tristage_rag_tpu.models.layers import Mlp

        base = dict(
            vocab_size=128, hidden_size=128, num_layers=1, num_heads=2,
            head_dim=64, mlp_dim=256, max_position_embeddings=32,
            dtype="float32", activation="geglu",
        )
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.standard_normal((2, 8, 128)) * 0.1, jnp.float32)
        m_ref = Mlp(EncoderConfig(**base))
        params = m_ref.init(jax.random.PRNGKey(0), x)
        y_ref = np.asarray(m_ref.apply(params, x))
        m_fused = Mlp(EncoderConfig(**base, fused_mlp=True))
        # param tree identical -> the plain params apply directly
        p_fused = m_fused.init(jax.random.PRNGKey(0), x)
        assert (
            jax.tree_util.tree_structure(p_fused)
            == jax.tree_util.tree_structure(params)
        )
        y_fused = np.asarray(m_fused.apply(params, x))
        np.testing.assert_allclose(y_fused, y_ref, atol=1e-4)

    def test_int8_takes_precedence_over_fused_mlp(self):
        """With both knobs on, the int8 pallas path owns the MLP (it
        already fuses the block); fused_mlp only applies when int8
        activations are off."""
        from tristage_rag_tpu.engine.factory import encoder_perf_overrides

        class C:
            stage3_act_int8 = "pallas"
            stage3_fused_mlp = True

        ov = encoder_perf_overrides(C(), "stage3")
        assert ov == {
            "int8_activations": True,
            "fused_mlp": True,
        }

    def test_yaml_roundtrip_carries_fused_mlp(self, tmp_path):
        from tristage_rag_tpu.engine.config import PipelineConfig

        cfg = PipelineConfig(
            stage1_fused_mlp=True, stage2_fused_mlp=False,
            stage3_fused_mlp=True,
        )
        path = tmp_path / "c.yaml"
        cfg.export(path)
        back = PipelineConfig.from_yaml(path)
        assert back.stage1_fused_mlp is True
        assert back.stage2_fused_mlp is False
        assert back.stage3_fused_mlp is True
        # the default is "auto" (accelerator-only) and survives a trip
        assert PipelineConfig().stage2_fused_mlp == "auto"

    def test_pipeline_smoke_with_fused_mlp(self):
        from tristage_rag_tpu.engine.config import PipelineConfig
        from tristage_rag_tpu.engine.pipeline import RetrievalPipeline

        docs = [f"doc {i} about topic {i % 4} quick brown fox"
                for i in range(12)]
        cfg = PipelineConfig(
            stage1_model="tiny-gemma", stage2_model="tiny-modernbert",
            stage3_model="tiny-bert", stage1_top_k=8, stage2_top_k=6,
            stage3_top_k=3, stage1_max_text_length=64,
            stage2_max_seq_length=32, stage3_max_length=64,
            mesh_data_parallel=1, compute_dtype="float32",
            stage1_fused_mlp=True, stage2_fused_mlp=True,
            stage3_fused_mlp=True,
        )
        p = RetrievalPipeline(cfg)
        p.add_documents(docs)
        out = p.search("quick brown fox topic 2", top_k=3)
        assert len(out["results"]) == 3


class TestShardMapComposition:
    def test_fused_qdense_under_shard_map(self):
        """The kernel must compose with shard_map (the sharded fused
        funnel wraps encoder forwards in one): rows sharded over the
        8-device mesh, weights replicated, result identical to the
        unsharded call."""
        import jax
        import jax.numpy as jnp
        from jax.sharding import Mesh, PartitionSpec as P

        from tristage_rag_tpu.ops.pallas_qdense import fused_qdense

        devs = jax.devices()
        if len(devs) < 8:
            pytest.skip("needs the 8-virtual-device CPU mesh")
        mesh = Mesh(np.asarray(devs[:8]), ("data",))
        x, w, b = _mk(8 * 32, 128, 128, seed=9)
        wq, ws = _wq(w)
        whole = fused_qdense(
            x, wq, ws, bias=b, out_dtype=jnp.float32, interpret=True
        )

        def local(xs):
            return fused_qdense(
                xs, wq, ws, bias=b, out_dtype=jnp.float32, interpret=True
            )

        # check_vma=False matches the production wrapping
        # (engine/fused.py, index/dense.py)
        sharded = jax.shard_map(
            local, mesh=mesh,
            in_specs=P("data", None), out_specs=P("data", None),
            check_vma=False,
        )(x)
        np.testing.assert_allclose(
            np.asarray(sharded), np.asarray(whole), atol=1e-5
        )


class TestConfigPlumbing:
    def test_act_int8_overrides_pallas_modes(self):
        from tristage_rag_tpu.engine.factory import act_int8_overrides

        assert act_int8_overrides("pallas") == {
            "int8_activations": True,
        }
        assert act_int8_overrides("static-pallas") == {
            "int8_activations": True, "int8_act_static": True,
        }
        with pytest.raises(ValueError):
            act_int8_overrides("mystery")

    def test_pipeline_smoke_with_pallas_mode(self):
        """Tiny (unaligned) models: every site falls back to the XLA
        int8 path inside _int8_dense — the knob must still produce a
        working pipeline with sane rankings."""
        from tristage_rag_tpu.engine.config import PipelineConfig
        from tristage_rag_tpu.engine.pipeline import RetrievalPipeline

        docs = [f"doc {i} about topic {i % 4} quick brown fox"
                for i in range(12)]
        cfg = PipelineConfig(
            stage1_model="tiny-gemma", stage2_model="tiny-modernbert",
            stage3_model="tiny-bert", stage1_top_k=8, stage2_top_k=6,
            stage3_top_k=3, stage1_max_text_length=64,
            stage2_max_seq_length=32, stage3_max_length=64,
            mesh_data_parallel=1, compute_dtype="float32",
            stage3_act_int8="pallas",
        )
        p = RetrievalPipeline(cfg)
        p.add_documents(docs)
        out = p.search("quick brown fox topic 2", top_k=3)
        assert len(out["results"]) == 3
        assert all("stage3_score" in r for r in out["results"])


def test_fused_mlp_unknown_string_rejected():
    """Only true/false/"auto" are legal: any other string (e.g. a
    copy-paste of an act_int8 mode) must fail loudly instead of
    silently enabling the kernel — on CPU that would mean interpret
    mode, orders of magnitude slower."""
    import pytest

    from tristage_rag_tpu.engine.config import PipelineConfig
    from tristage_rag_tpu.engine.factory import encoder_perf_overrides

    cfg = PipelineConfig(stage2_fused_mlp="dynamic")
    with pytest.raises(ValueError, match="stage2_fused_mlp"):
        encoder_perf_overrides(cfg, "stage2")
