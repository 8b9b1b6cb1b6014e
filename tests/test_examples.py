"""The examples/ scripts must stay runnable — they are the user-facing
switch story (migrate_from_reference) and pipeline walkthrough
(training_corpus_pipeline)."""

import os
import subprocess
import sys

import pytest

# r13: slow tier — each example is a subprocess Spark session (~225 s
# total), excluded from the default run (pytest.ini).
pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_training_corpus_pipeline_runs(tmp_path, sf_dir):
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "examples", "training_corpus_pipeline.py"),
         sf_dir, str(tmp_path)],
        capture_output=True, text=True, timeout=420,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "kept after gates+dedup+resample" in r.stdout
    assert "txlog" in r.stdout


def test_multimodal_media_pipeline_runs():
    env = dict(os.environ, SPARK_GRAFT_CPUS="8")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "examples", "multimodal_media_pipeline.py"),
         "12"],
        capture_output=True, text=True, timeout=420, env=env,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "exact binary duplicates (content-hash groups > 1): 1" in r.stdout
    assert "dominant FFT bin mismatches synthesis: 0" in r.stdout
    assert r.stdout.strip().endswith("OK")


def test_rag_retrieval_pipeline_runs(sf_dir):
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "examples", "rag_retrieval_pipeline.py"),
         sf_dir],
        capture_output=True, text=True, timeout=420,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "rag pipeline complete" in r.stdout


def test_analytics_observability_runs(sf_dir):
    env = dict(os.environ, SPARK_GRAFT_CPUS="8")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "examples", "analytics_observability.py"),
         sf_dir],
        capture_output=True, text=True, timeout=420, env=env,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "analytics observability complete" in r.stdout
    assert "predicted=actual=" in r.stdout


def test_parameter_planning_runs(sf_dir):
    env = dict(os.environ, SPARK_GRAFT_CPUS="8")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "examples", "parameter_planning.py"),
         sf_dir],
        capture_output=True, text=True, timeout=420, env=env,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "jaccard target 0.35: 8 bands x 2 rows" in r.stdout
    assert "auto-chosen gap:" in r.stdout
    assert r.stdout.strip().endswith("OK")


def test_recipe_evaluation_runs(sf_dir):
    env = dict(os.environ, SPARK_GRAFT_CPUS="8")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "examples", "recipe_evaluation.py"),
         sf_dir],
        capture_output=True, text=True, timeout=420, env=env,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "mips recall_pct=" in r.stdout
    assert "cluster split leaked pairs: 0" in r.stdout
    assert r.stdout.strip().endswith("OK")


def test_audit_before_scale_runs(sf_dir):
    env = dict(os.environ, SPARK_GRAFT_CPUS="8")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "examples", "audit_before_scale.py"),
         sf_dir],
        capture_output=True, text=True, timeout=420, env=env,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "CMS never" not in r.stdout  # assertions live in the script
    assert "cosine over first 64 dims: recall@10 100%" in r.stdout
    assert r.stdout.strip().endswith("audit-before-scale walkthrough complete")
