"""The Sphinx API-doc tree must reference only importable, existing symbols.

Sphinx itself is not available in this environment (the CI documentation
job builds the html); this test is the local gate that the autodoc tree
cannot fail on imports or dangling autosummary entries — the two ways an
rst tree rots.
"""

import importlib
import re
from pathlib import Path

import pytest

DOCS = Path(__file__).resolve().parents[2] / "docs"
RST_FILES = sorted(DOCS.rglob("*.rst"))


def _autosummary_blocks(text: str):
    """Yield (currentmodule, entry) pairs from an rst document."""
    module = None
    lines = text.splitlines()
    i = 0
    while i < len(lines):
        line = lines[i]
        m = re.match(r"\.\.\s+currentmodule::\s+(\S+)", line.strip())
        if m:
            module = m.group(1)
        if line.strip() == ".. autosummary::":
            i += 1
            while i < len(lines):
                entry = lines[i].strip()
                if entry.startswith(":") or not entry:
                    if entry == "" and i + 1 < len(lines) and (
                        lines[i + 1].startswith("   ")
                        and lines[i + 1].strip()
                        and not lines[i + 1].strip().startswith(("..", ":"))
                    ):
                        i += 1
                        continue
                    if not entry:
                        break
                    i += 1
                    continue
                if entry.startswith(".."):
                    break
                yield module, entry
                i += 1
        i += 1


def test_docs_tree_exists():
    assert (DOCS / "conf.py").is_file()
    assert (DOCS / "index.rst").is_file()
    assert RST_FILES, "empty docs tree"


@pytest.mark.parametrize("rst", RST_FILES, ids=lambda p: p.name)
def test_automodule_targets_import(rst):
    text = rst.read_text()
    targets = re.findall(r"\.\.\s+automodule::\s+(\S+)", text)
    for target in targets:
        importlib.import_module(target)


@pytest.mark.parametrize("rst", RST_FILES, ids=lambda p: p.name)
def test_autosummary_entries_resolve(rst):
    text = rst.read_text()
    missing = []
    for module_name, entry in _autosummary_blocks(text):
        assert module_name, f"{rst.name}: autosummary without currentmodule"
        obj = importlib.import_module(module_name)
        for part in entry.split("."):
            try:
                obj = getattr(obj, part)
            except AttributeError:
                try:
                    obj = importlib.import_module(
                        f"{module_name}.{entry.rsplit('.', 1)[0]}"
                    )
                    obj = getattr(obj, entry.rsplit(".", 1)[1])
                    break
                except (ImportError, AttributeError):
                    missing.append(f"{module_name}::{entry}")
                    break
    assert not missing, f"{rst.name}: dangling autosummary entries {missing}"


def test_toctree_targets_exist():
    for rst in RST_FILES:
        text = rst.read_text()
        lines = text.splitlines()
        in_toc = False
        for line in lines:
            if line.strip().startswith(".. toctree::"):
                in_toc = True
                continue
            if in_toc:
                s = line.strip()
                if s.startswith(":") or not s:
                    continue
                if not line.startswith("   "):
                    in_toc = False
                    continue
                target = (rst.parent / f"{s}.rst").resolve()
                assert target.is_file(), f"{rst.name}: toctree -> {s} missing"
