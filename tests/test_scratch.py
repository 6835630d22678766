"""Scratch/fixture root contract: env-configurable (multi-node clusters
point SXRAY_SCRATCH_ROOT at a shared filesystem), collision-free per
input path + process, and version-keyed for fixture invalidation."""
import importlib.util
import os


def _load_entry():
    spec = importlib.util.spec_from_file_location(
        "_entry_under_test",
        os.path.join(os.path.dirname(__file__), "..", "__ray_entry__.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_scratch_root_env_is_honored(monkeypatch, tmp_path):
    monkeypatch.setenv("SXRAY_SCRATCH_ROOT", str(tmp_path))
    mod = _load_entry()
    assert mod._FIXTURE_CACHE.startswith(str(tmp_path))
    assert mod._scratch_dir("ivm", "/root/testdata/sf0.01").startswith(str(tmp_path))


def test_scratch_dir_distinguishes_same_basename(tmp_path):
    mod = _load_entry()
    a = (tmp_path / "x" / "sf0.01"); a.mkdir(parents=True)
    b = (tmp_path / "y" / "sf0.01"); b.mkdir(parents=True)
    da, db = mod._scratch_dir("ivm", str(a)), mod._scratch_dir("ivm", str(b))
    assert da != db
    # stable within one process for the same input
    assert da == mod._scratch_dir("ivm", str(a))
    # pid-keyed: two concurrent drivers never rmtree each other
    assert str(os.getpid()) in os.path.basename(da)


def test_fixture_cache_key_invalidates_on_version():
    mod = _load_entry()
    from sanskrit_ocr_ray.synth import FIXTURE_VERSION

    tag = os.path.basename(os.path.normpath("/root/testdata/sf0.001"))
    expected = os.path.join(
        mod._FIXTURE_CACHE, f"{tag}-{mod._N_DOCS[tag]}-v{FIXTURE_VERSION}"
    )
    # the cache path embeds the synth version: bumping FIXTURE_VERSION
    # must produce a different directory (stale fixtures self-invalidate)
    assert f"-v{FIXTURE_VERSION}" in expected
    other = expected.replace(f"-v{FIXTURE_VERSION}", f"-v{FIXTURE_VERSION + 1}")
    assert other != expected


def test_schema_union_scratch_is_rooted_and_pid_keyed(
    ray_session, monkeypatch, tmp_path
):
    """_schema_union must route its generation dirs through
    _scratch_dir: honoring SXRAY_SCRATCH_ROOT (shared-fs clusters) and
    the pid key (two concurrent runs on the same fixture can't race
    each other's rmtree/write)."""
    import shutil

    monkeypatch.setenv("SXRAY_SCRATCH_ROOT", str(tmp_path))
    mod = _load_entry()
    sf = "/root/testdata/sf0.001"
    shutil.rmtree("/tmp/sxray_schema_union", ignore_errors=True)  # stale pre-fix runs
    out = mod._schema_union(sf)
    assert out.count() > 0
    root = mod._scratch_dir("schema_union", sf)
    assert root.startswith(str(tmp_path))
    assert str(os.getpid()) in os.path.basename(root)
    assert os.path.isdir(os.path.join(root, "gen_a"))
    assert os.path.isdir(os.path.join(root, "gen_b"))
    # nothing escaped to the legacy hardcoded /tmp location
    assert not os.path.isdir("/tmp/sxray_schema_union")
