"""Distribution: wheel contents, console scripts, native-source lookup.

The reference ships as a conda env + checkout (env.yaml,
scripts/download_ckpts.sh); this framework is a pip-installable wheel
whose C++ runtime sources ride along and compile on first use
(native_build.py). These tests pin that story.
"""

import os
import stat
import subprocess
import sys
import zipfile

import pytest

from d3fields_tpu import native_build

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_find_source_checkout_layout():
    p = native_build.find_source("isosurface.cpp")
    assert p is not None and p.endswith(os.path.join("native", "isosurface.cpp"))
    assert native_build.find_source("nope.cpp") is None


def test_lib_dir_writable_stays_next_to_source(tmp_path):
    src = tmp_path / "x.cpp"
    src.write_text("")
    assert native_build.lib_dir_for(str(src)) == str(tmp_path)


def test_lib_dir_readonly_falls_back_to_cache(tmp_path, monkeypatch):
    ro = tmp_path / "ro"
    ro.mkdir()
    src = ro / "x.cpp"
    src.write_text("")
    cache = tmp_path / "cache"
    monkeypatch.setenv("D3F_NATIVE_CACHE", str(cache))
    ro.chmod(stat.S_IRUSR | stat.S_IXUSR)
    try:
        if os.access(str(ro), os.W_OK):  # running as root: W_OK ignores mode
            pytest.skip("cannot make a directory read-only for this uid")
        assert native_build.lib_dir_for(str(src)) == str(cache)
        assert cache.is_dir()
    finally:
        ro.chmod(stat.S_IRWXU)


@pytest.mark.slow
def test_wheel_ships_native_sources_and_scripts(tmp_path):
    """``pip wheel`` (offline, no deps) must produce a wheel carrying the
    package, the C++ runtime sources, and the console-script entry
    points declared in pyproject.toml."""
    r = subprocess.run(
        [sys.executable, "-m", "pip", "wheel", "--no-deps",
         "--no-build-isolation", "--wheel-dir", str(tmp_path), REPO],
        capture_output=True, text=True, timeout=600,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    wheels = [f for f in os.listdir(tmp_path) if f.endswith(".whl")]
    assert len(wheels) == 1 and wheels[0].startswith("d3fields_tpu-")
    with zipfile.ZipFile(tmp_path / wheels[0]) as z:
        names = z.namelist()
        assert "d3fields_tpu/_native_src/isosurface.cpp" in names
        assert "d3fields_tpu/_native_src/pointcloud.cpp" in names
        # no compiled artifacts leak into the wheel
        assert not any(n.endswith(".so") for n in names)
        assert "d3fields_tpu/serving.py" in names
        assert "d3fields_tpu/apps/convert_ckpts.py" in names
        meta = [n for n in names if n.endswith("entry_points.txt")]
        assert meta, names[-10:]
        eps = z.read(meta[0]).decode()
        for script in ("d3f-vis-repr", "d3f-vis-tracking", "d3f-train-xmem",
                       "d3f-eval-xmem", "d3f-convert-ckpts", "d3f-click-track",
                       "d3f-merge-scores", "d3f-precompute-pca",
                       "d3f-interactive"):
            assert script in eps, eps
