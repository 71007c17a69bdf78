"""Headless tests for the deepened GUI capability layer.

Covers the reference GUI's session richness (multi-config overlay
management, session cache with rig spec, built-in config editor,
results-folder routing, dashboard, error-detail codec — reference
``user_interface_gui.py:81-632``) through the display-free models in
``gui_support``.
"""

from pathlib import Path

import pytest

from darsia_tpu.presets.workflows.gui_support import (
    ConfigEditorModel,
    ConfigManager,
    conflict_choice_to_policy,
    dashboard_lines,
    decode_error_details,
    deduplicate_paths,
    encode_error_details,
    move_item,
    new_config_from_template,
    normalize_config_paths,
    open_in_file_explorer,
    read_session_cache,
    resolve_rig_class,
    results_folder_for_step,
    template_config_path,
    utils_bundle_defaults,
    write_session_cache,
)
from darsia_tpu.presets.workflows.user_interface_gui import GuiSession


# ----------------------------------------------------------- path handling


def test_normalize_config_paths_dedup_blank_order():
    paths = normalize_config_paths(["/a/b.toml", "  ", "/a/b.toml", "/c.toml"])
    assert paths == [Path("/a/b.toml"), Path("/c.toml")]


def test_deduplicate_paths_preserves_order():
    a, b = Path("/x"), Path("/y")
    assert deduplicate_paths([a, b, a, b, a]) == [a, b]


def test_move_item_clamps_and_reorders():
    items = ["a", "b", "c"]
    assert move_item(items, 2, -1) == 1
    assert items == ["a", "c", "b"]
    assert move_item(items, 0, -5) == 0  # clamp at the top
    assert move_item(items, 2, +9) == 2  # clamp at the bottom
    with pytest.raises(IndexError):
        move_item(items, 7, 1)
    with pytest.raises(IndexError):
        move_item([], 0, 1)


# ----------------------------------------------------------- config manager


def _write_overlays(tmp_path):
    base = tmp_path / "base.toml"
    base.write_text(
        '[data]\nimages = "imgs"\nbaseline = ["b.jpg"]\nresults = "%s"\n'
        '[analysis.mass]\nrois = []\n' % (tmp_path / "results")
    )
    override = tmp_path / "override.toml"
    override.write_text(
        '[analysis.mass]\nfolder = "%s"\n' % (tmp_path / "custom_mass")
    )
    return base, override


def test_config_manager_merge_order(tmp_path):
    base, override = _write_overlays(tmp_path)
    manager = ConfigManager([base, override])
    merged = manager.merged()
    # later file wins on the nested key, earlier keys survive
    assert merged["analysis"]["mass"]["folder"] == str(tmp_path / "custom_mass")
    assert merged["data"]["images"] == "imgs"
    assert manager.results_folder() == tmp_path / "results"


def test_config_manager_add_remove_move(tmp_path):
    base, override = _write_overlays(tmp_path)
    manager = ConfigManager()
    assert manager.add(base) is True
    assert manager.add(base) is False  # duplicate
    manager.add(override)
    assert manager.move(1, -1) == 0
    assert manager.paths[0] == override.resolve()
    removed = manager.remove(0)
    assert removed == override.resolve()
    assert manager.as_strings() == [str(base.resolve())]


def test_results_folder_for_step_routing(tmp_path):
    base, override = _write_overlays(tmp_path)
    # default: <results>/<mode>
    assert results_folder_for_step("analysis: mass", [base]) == (
        tmp_path / "results" / "mass"
    )
    # override: analysis.mass.folder wins
    assert results_folder_for_step("analysis: mass", [base, override]) == (
        tmp_path / "custom_mass"
    )
    assert results_folder_for_step("setup: rig", [base]) == (
        tmp_path / "results" / "setup"
    )
    assert results_folder_for_step("utils: media", [base]) == (
        tmp_path / "results" / "videos"
    )
    assert results_folder_for_step("comparison: wasserstein", [base]) == (
        tmp_path / "results" / "wasserstein"
    )
    # unreadable config set -> None, never an exception
    assert results_folder_for_step("analysis: mass", ["/nonexistent.toml"]) is None


def test_utils_bundle_defaults(tmp_path):
    base, _ = _write_overlays(tmp_path)
    export, imp = utils_bundle_defaults([base])
    assert export.endswith("calibration_bundle.zip")
    assert export == imp
    assert utils_bundle_defaults([]) == ("", "")


# --------------------------------------------------------------- rig specs


def test_resolve_rig_class_default_and_spec():
    from darsia_tpu.presets.workflows.rig import Rig

    assert resolve_rig_class("") is Rig
    assert (
        resolve_rig_class("darsia_tpu.presets.workflows.rig:Rig") is Rig
    )


def test_resolve_rig_class_errors():
    with pytest.raises(ValueError, match="module.path:ClassName"):
        resolve_rig_class("not-a-spec")
    with pytest.raises(ValueError, match="not found"):
        resolve_rig_class("darsia_tpu.presets.workflows.rig:NoSuchRig")
    with pytest.raises(ValueError, match="not a subclass"):
        resolve_rig_class("pathlib:Path")


# ------------------------------------------------------------ session cache


def test_session_cache_v2_roundtrip(tmp_path):
    cache = tmp_path / "cache.json"
    state = {
        "config_paths": ["/a.toml", "/b.toml"],
        "rig_spec": "darsia_tpu.presets.workflows.rig:Rig",
        "last_step": "analysis: mass",
        "all_images": True,
        "history": [{"step": "analysis: mass"}],
    }
    write_session_cache(cache, state)
    restored = read_session_cache(cache)
    assert restored["config_paths"] == ["/a.toml", "/b.toml"]
    assert restored["rig_spec"] == state["rig_spec"]
    assert restored["last_step"] == "analysis: mass"
    assert restored["all_images"] is True
    assert restored["history"] == [{"step": "analysis: mass"}]


def test_session_cache_v1_migration(tmp_path):
    cache = tmp_path / "old.json"
    cache.write_text('{"config": "/legacy/config.toml", "all_images": true}')
    restored = read_session_cache(cache)
    assert restored["config_paths"] == ["/legacy/config.toml"]
    assert restored["all_images"] is True


def test_session_cache_corruption_is_tolerated(tmp_path):
    cache = tmp_path / "broken.json"
    cache.write_text("{not json")
    assert read_session_cache(cache)["config_paths"] == []
    cache.write_text("[1, 2, 3]")
    assert read_session_cache(cache)["config_paths"] == []


def test_gui_session_multi_config_management(tmp_path):
    session = GuiSession(cache_path=tmp_path / "s.json")
    assert session.add_config("/one.toml") is True
    assert session.add_config("/one.toml") is False
    session.add_config("/two.toml")
    assert session.move_config(1, -1) == 0
    assert session.config_paths == ["/two.toml", "/one.toml"]
    session.remove_config(0)
    assert session.config_paths == ["/one.toml"]
    # persisted across relaunch
    restored = GuiSession(cache_path=tmp_path / "s.json")
    assert restored.config_paths == ["/one.toml"]


def test_gui_session_rig_spec_validation(tmp_path):
    session = GuiSession(cache_path=tmp_path / "s.json")
    session.set_rig_spec("darsia_tpu.presets.workflows.rig:Rig")
    assert session.state["rig_spec"].endswith(":Rig")
    with pytest.raises(ValueError):
        session.set_rig_spec("bogus")


# ------------------------------------------------------------ config editor


def test_config_editor_dirty_save_roundtrip(tmp_path):
    target = tmp_path / "c.toml"
    target.write_text('[data]\nimages = "x"\n')
    model = ConfigEditorModel()
    model.open(target)
    assert not model.dirty
    model.set_text('[data]\nimages = "y"\n')
    assert model.dirty
    saved = model.save()
    assert saved == target
    assert not model.dirty
    assert 'images = "y"' in target.read_text()


def test_config_editor_rejects_bad_toml(tmp_path):
    model = ConfigEditorModel()
    model.set_text("not = valid = toml")
    with pytest.raises(ValueError, match="not valid TOML"):
        model.save_as(tmp_path / "out.toml")
    with pytest.raises(ValueError, match="No file open"):
        ConfigEditorModel().save()


def test_new_config_from_template(tmp_path):
    assert template_config_path().exists()
    created = new_config_from_template(tmp_path / "fresh.toml")
    assert created.read_text() == template_config_path().read_text()
    with pytest.raises(FileExistsError):
        new_config_from_template(created)


# ----------------------------------------------------- dashboard + dialogs


def test_dashboard_lines(tmp_path):
    base, override = _write_overlays(tmp_path)
    lines = dashboard_lines([base, override], rig_spec="")
    text = "\n".join(lines)
    assert "Config files: 2" in text
    assert "Results:" in text
    assert "Sections:" in text
    assert "analysis" in text
    assert "default Rig" in text
    # empty set short-circuits
    assert "(none selected)" in "\n".join(dashboard_lines([]))
    # missing files are flagged, not fatal
    lines = dashboard_lines([tmp_path / "missing.toml"])
    assert any("missing!" in line for line in lines)


def test_error_details_codec():
    payload = encode_error_details("step failed: boom", "Traceback ...")
    message, details = decode_error_details(payload)
    assert message == "step failed: boom"
    assert details == "Traceback ..."
    assert decode_error_details("plain") == ("plain", None)


def test_conflict_choice_to_policy():
    assert conflict_choice_to_policy(True) == "overwrite"
    assert conflict_choice_to_policy(False) == "skip"
    assert conflict_choice_to_policy(None) is None


def test_worker_death_without_sentinel_is_flagged():
    """A hard-crashed worker (no __done__/__failed__ over the queue) must
    not leave the GUI in "running" forever — poll() detects the dead
    process and flags failure (reference _poll_worker_completion)."""
    import multiprocessing as mp

    from darsia_tpu.presets.workflows.user_interface_gui import WorkerHandle

    ctx = mp.get_context("spawn")

    class DeadProcess:
        pid = -1
        exitcode = -9  # killed

        def is_alive(self):
            return False

    handle = WorkerHandle(
        step="analysis: mass",
        process=DeadProcess(),
        log_queue=ctx.Queue(),
        progress_queue=ctx.Queue(),
        preview_queue=ctx.Queue(),
    )
    logs = []
    handle.poll(on_log=logs.append)
    assert handle.finished and handle.failed
    assert any("died without completing" in line for line in logs)


def test_open_in_file_explorer_walks_to_existing(tmp_path):
    calls = []
    command = open_in_file_explorer(
        tmp_path / "does" / "not" / "exist", runner=calls.append
    )
    assert calls == [command]
    # target fell back to the nearest existing ancestor
    assert command[-1] == str(tmp_path)
