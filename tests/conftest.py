"""Session-scoped Ray + fixture corpus for all tests (one ray.init per session)."""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

REPO_ROOT = Path(__file__).resolve().parent.parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))


@pytest.fixture(scope="session")
def ray_session():
    import ray
    from ray.data import DataContext

    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.verbose_progress = False
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def unit_corpus(tmp_path_factory) -> Path:
    """~2k-turn deterministic transcript corpus (FIXTURES.md sf-unit)."""
    from medical_ocr_service_ray.synth import generate_transcripts

    out = tmp_path_factory.mktemp("transcripts") / "unit"
    return generate_transcripts(out, 2000, seed=42, n_files=4)


@pytest.fixture(scope="session")
def golden_table(unit_corpus):
    from medical_ocr_service_ray.oracle import oracle_extract_dir

    return oracle_extract_dir(unit_corpus)
