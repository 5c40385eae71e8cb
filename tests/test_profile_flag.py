"""``--profile`` produces a real trace artifact (VERDICT r3 weak #4: the one
§5 subsystem with no test — a broken ``maybe_profile`` context would ship
silently).

SURVEY.md §5 "Tracing / profiling": the reference has none (printf only);
the rebuild's equivalent is a ``jax.profiler`` trace behind ``--profile`` on
every model CLI (models/common.py run_cli). CPU-safe: ``jax.profiler.trace``
writes xplane protobufs on every backend.
"""

import os

import pytest


@pytest.fixture
def env_data_dir(tmp_path):
    os.environ["BLA_DATA_DIR"] = str(tmp_path)
    yield tmp_path
    del os.environ["BLA_DATA_DIR"]


def _trace_artifacts(logdir):
    return [p for pat in ("**/*.pb", "**/*.json.gz", "**/*.trace")
            for p in logdir.glob(pat) if p.stat().st_size > 0]


def test_profile_flag_writes_trace(env_data_dir, tmp_path, capsys):
    from big_linear_algebra_tpu.models import my_first_model as mfm

    logdir = tmp_path / "prof"
    assert mfm.main(["init"]) == 0
    assert mfm.main(["train", "20", "0.1", f"--profile={logdir}"]) == 0
    out = capsys.readouterr().out
    assert f"profile written to {logdir}" in out
    arts = _trace_artifacts(logdir)
    assert arts, f"--profile produced no non-empty trace artifact in {logdir}"


def test_profile_flag_default_dir(env_data_dir, capsys, tmp_path,
                                  monkeypatch):
    """Bare ``--profile`` (no value) uses the default logdir — the CLI shape
    every model program documents. TMPDIR-safe: point the default at a tmp
    path is not possible (the default is fixed), so just assert the verb
    succeeds and reports the default dir."""
    from big_linear_algebra_tpu.models import my_first_model as mfm

    assert mfm.main(["init"]) == 0
    assert mfm.main(["run", "--profile"]) == 0
    assert "profile written to /tmp/bla_profile" in capsys.readouterr().out
