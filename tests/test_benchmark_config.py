import pytest
import yaml

from tristage_rag_tpu.eval.config import BenchmarkConfig


class TestBenchmarkConfig:
    def test_defaults(self):
        cfg = BenchmarkConfig()
        assert cfg.get("benchmark.evaluation.top_k") == 20
        assert cfg.get("benchmark.pipeline.stage1.top_k") == 500
        assert cfg.get("nope.deep.key", "fallback") == "fallback"

    def test_yaml_overlay(self, tmp_path):
        p = tmp_path / "b.yaml"
        p.write_text(yaml.safe_dump({
            "benchmark": {
                "models_dir": "./m",
                "datasets_dir": "./d",
                "evaluation": {"top_k": 7},
            }
        }))
        cfg = BenchmarkConfig(p)
        assert cfg.get("benchmark.evaluation.top_k") == 7
        # untouched defaults survive the merge
        assert cfg.get("benchmark.pipeline.stage2.max_seq_length") == 192

    def test_low_memory_merge_with_overrides(self, tmp_path):
        p = tmp_path / "b.yaml"
        p.write_text(yaml.safe_dump({
            "benchmark": {
                "low_memory_mode": True,
                "pipeline_overrides": {
                    "pipeline": {"stage2": {"batch_size": 2}},
                },
            }
        }))
        cfg = BenchmarkConfig(p)
        # low-mem default applied...
        assert cfg.get("benchmark.pipeline.stage3.max_length") == 192
        # ...but explicit override wins over the low-mem value (4)
        assert cfg.get("benchmark.pipeline.stage2.batch_size") == 2

    def test_overrides_without_low_memory(self, tmp_path):
        p = tmp_path / "b.yaml"
        p.write_text(yaml.safe_dump({
            "benchmark": {
                "pipeline_overrides": {"pipeline": {"stage1": {"top_k": 42}}},
            }
        }))
        cfg = BenchmarkConfig(p)
        assert cfg.get("benchmark.pipeline.stage1.top_k") == 42

    def test_required_key_validation(self, tmp_path):
        p = tmp_path / "b.yaml"
        p.write_text(yaml.safe_dump({"benchmark": {"models_dir": None}}))
        with pytest.raises(ValueError, match="required"):
            BenchmarkConfig(p)

    def test_abs_path(self, tmp_path):
        cfg = BenchmarkConfig(root_dir=tmp_path)
        assert cfg.abs_path("benchmark.models_dir") == (tmp_path / "models").resolve()

    def test_to_pipeline_config(self, tmp_path):
        p = tmp_path / "b.yaml"
        p.write_text(yaml.safe_dump({
            "benchmark": {
                "pipeline": {"stage1": {"top_k": 333, "model": "tiny-gemma"}},
            }
        }))
        cfg = BenchmarkConfig(p, root_dir=tmp_path)
        pc = cfg.to_pipeline_config()
        assert pc.stage1_top_k == 333
        assert pc.stage1_model == "tiny-gemma"
        assert pc.stage3_top_k == 20


class TestDownloaderCLI:
    """Model-management CLI parity (benchmark/run_mteb_evaluation.py:164-185,
    download_models.py:382-430): info/clean/download/ensure subcommands."""

    def _run(self, monkeypatch, argv):
        import sys

        from tristage_rag_tpu.eval import downloaders

        monkeypatch.setattr(sys, "argv", ["downloaders"] + argv)
        return downloaders.main()

    def test_info_reports_missing_models(self, tmp_path, monkeypatch, capsys):
        import json

        rc = self._run(monkeypatch, ["info", "--models-dir", str(tmp_path)])
        assert rc == 0
        out = json.loads(capsys.readouterr().out)
        assert out["models_dir"] == str(tmp_path)
        assert out["available"] and not any(out["available"].values())

    def test_clean_empties_dir(self, tmp_path, monkeypatch):
        (tmp_path / "somemodel").mkdir()
        (tmp_path / "somemodel" / "weights.safetensors").write_bytes(b"x")
        rc = self._run(monkeypatch, ["clean", "--models-dir", str(tmp_path)])
        assert rc == 0
        assert not tmp_path.exists()  # clean removes the whole tree

    def test_download_requires_repo(self, tmp_path, monkeypatch):
        rc = self._run(monkeypatch, ["download", "--models-dir", str(tmp_path)])
        assert rc == 2
