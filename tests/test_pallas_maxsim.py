"""Fused Pallas MaxSim vs the XLA reference (interpret mode on CPU)."""

import numpy as np
import pytest

import jax.numpy as jnp

from tristage_rag_tpu.ops.maxsim import _normalize, maxsim_scores
from tristage_rag_tpu.ops.pallas_maxsim import fused_maxsim


def _case(c, lq, ld, d, seed=0):
    rng = np.random.default_rng(seed)
    q = rng.standard_normal((lq, d)).astype(np.float32)
    qm = (rng.random(lq) > 0.2).astype(np.int32)
    qm[0] = 1
    dt = rng.standard_normal((c, ld, d)).astype(np.float32)
    dm = (rng.random((c, ld)) > 0.3).astype(np.int32)
    return q, qm, dt, dm


@pytest.mark.parametrize("method", ["maxsim", "colbert"])
@pytest.mark.parametrize("c,lq,ld", [(23, 5, 50), (16, 8, 128), (3, 32, 17)])
def test_matches_xla_reference(method, c, lq, ld):
    q, qm, dt, dm = _case(c, lq, ld, 128)
    ref = np.asarray(maxsim_scores(q, qm, dt, dm, method=method))
    qn = np.asarray(_normalize(jnp.asarray(q)))
    dn = np.asarray(_normalize(jnp.asarray(dt)))
    got = np.asarray(fused_maxsim(qn, qm, dn, dm, method=method, interpret=True))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_empty_candidate_scores_zero():
    q, qm, dt, dm = _case(8, 4, 20, 128, seed=1)
    dm[2] = 0
    qn = np.asarray(_normalize(jnp.asarray(q)))
    dn = np.asarray(_normalize(jnp.asarray(dt)))
    got = np.asarray(fused_maxsim(qn, qm, dn, dm, interpret=True))
    assert got[2] == 0.0


def test_block_boundary_padding():
    # C not a multiple of the candidate block: padded scores must not leak
    q, qm, dt, dm = _case(17, 6, 30, 128, seed=2)
    ref = np.asarray(maxsim_scores(q, qm, dt, dm))
    qn = np.asarray(_normalize(jnp.asarray(q)))
    dn = np.asarray(_normalize(jnp.asarray(dt)))
    got = np.asarray(
        fused_maxsim(qn, qm, dn, dm, block_candidates=16, interpret=True)
    )
    assert got.shape == (17,)
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_in_jit_normalize_matches_xla():
    """normalize=True hands raw embeddings to the kernel exactly as the
    XLA path takes them (the stage-2 wiring contract)."""
    q, qm, dt, dm = _case(16, 8, 64, 128, seed=3)
    ref = np.asarray(maxsim_scores(q, qm, dt, dm))
    got = np.asarray(fused_maxsim(
        jnp.asarray(q), jnp.asarray(qm), jnp.asarray(dt), jnp.asarray(dm),
        normalize=True, interpret=True,
    ))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


class TestStage2Wiring:
    """stage2_maxsim_impl='pallas' routes the staged rescorer through
    the fused kernel with identical rankings/scores."""

    def _scorer(self, impl):
        from tristage_rag_tpu.engine.config import PipelineConfig
        from tristage_rag_tpu.engine.stage2 import ColBERTScorer

        return ColBERTScorer(PipelineConfig(
            stage1_model="tiny-gemma", stage2_model="tiny-modernbert",
            stage3_model="tiny-bert", stage2_top_k=8,
            stage2_max_seq_length=32, mesh_data_parallel=1,
            compute_dtype="float32", stage2_maxsim_impl=impl,
        ))

    def test_rescore_parity(self):
        docs = [f"doc {i} about topic {i % 4} quick brown fox"
                for i in range(16)]
        cands = [{"doc_id": i, "document": d, "score": 0.5}
                 for i, d in enumerate(docs)]
        out = {}
        for impl in ("xla", "pallas"):
            r = self._scorer(impl).rescore_candidates(
                "quick brown fox topic 2", list(cands)
            )
            # a silent pass-through (stage-level failure) would lack
            # stage2_score — fail loudly instead of vacuously passing
            assert all("stage2_score" in x for x in r), impl
            out[impl] = r
        ids = {k: [x["doc_id"] for x in v] for k, v in out.items()}
        assert ids["xla"] == ids["pallas"]
        sx = np.array([x["stage2_score"] for x in out["xla"]])
        sp = np.array([x["stage2_score"] for x in out["pallas"]])
        np.testing.assert_allclose(sx, sp, atol=1e-5)

    def test_yaml_roundtrip(self, tmp_path):
        from tristage_rag_tpu.engine.config import PipelineConfig

        cfg = PipelineConfig(stage2_maxsim_impl="pallas")
        path = tmp_path / "c.yaml"
        cfg.export(path)
        assert PipelineConfig.from_yaml(path).stage2_maxsim_impl == "pallas"

    def test_unknown_method_raises_like_xla(self):
        q = jnp.zeros((4, 32), jnp.float32)
        qm = jnp.ones((4,), jnp.int32)
        dt = jnp.zeros((3, 8, 32), jnp.float32)
        dm = jnp.ones((3, 8), jnp.int32)
        with pytest.raises(ValueError, match="method"):
            fused_maxsim(q, qm, dt, dm, method="max_sim", interpret=True)

    def test_mesh_scorer_keeps_xla_path(self, monkeypatch):
        """With a device mesh the sharded token-cache gathers cannot
        feed a plain pallas_call on hardware — the impl knob must fall
        back to the XLA path (which shard-maps fine)."""
        import jax

        if len(jax.devices()) < 2:
            pytest.skip("needs multiple devices")
        import tristage_rag_tpu.ops.pallas_maxsim as pm
        from tristage_rag_tpu.engine.config import PipelineConfig
        from tristage_rag_tpu.engine.stage2 import ColBERTScorer
        from tristage_rag_tpu.parallel.mesh import create_mesh

        def boom(*a, **kw):
            raise AssertionError("pallas path must not run on a mesh")

        monkeypatch.setattr(pm, "fused_maxsim", boom)
        mesh = create_mesh(0)
        s = ColBERTScorer(PipelineConfig(
            stage1_model="tiny-gemma", stage2_model="tiny-modernbert",
            stage3_model="tiny-bert", stage2_top_k=4,
            stage2_max_seq_length=32, compute_dtype="float32",
            stage2_maxsim_impl="pallas",
        ), mesh=mesh)
        docs = [f"doc {i} quick brown fox" for i in range(6)]
        cands = [{"doc_id": i, "document": d, "score": 0.5}
                 for i, d in enumerate(docs)]
        r = s.rescore_candidates("quick brown fox", cands)
        assert all("stage2_score" in x for x in r)
