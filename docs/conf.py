# Sphinx configuration for the darsia_tpu API reference.
#
# Mirrors the reference's docs/conf.py (pydata theme, autodoc/autosummary/
# napoleon, grouped members) adapted to this package: the compute path is
# JAX, so intersphinx maps jax instead of skimage/sklearn.

import os
import sys

sys.path.insert(0, os.path.abspath(".."))

project = "darsia_tpu"
copyright = "2026, darsia_tpu developers"
author = "darsia_tpu developers"
release = "1.0"

root_doc = "index"

extensions = [
    "sphinx.ext.viewcode",
    "sphinx.ext.autodoc",
    "sphinx.ext.autosummary",
    "sphinx.ext.napoleon",
    "sphinx.ext.intersphinx",
]

add_module_names = False
templates_path = ["_templates"]
exclude_patterns = ["_build", "Thumbs.db", ".DS_Store"]

html_theme = "pydata_sphinx_theme"
html_static_path = []
html_short_title = "darsia_tpu"
html_split_index = True
html_copy_source = False
html_show_sourcelink = False
html_show_sphinx = False
html_theme_options = {"show_toc_level": 4}

# -- Autodoc -----------------------------------------------------------------

autoclass_content = "class"
autodoc_class_signature = "mixed"
autodoc_member_order = "groupwise"
autodoc_typehints_format = "short"
autodoc_default_options = {
    "members": True,
    "special-members": False,
    "private-members": False,
    "show-inheritance": True,
    "inherited-members": True,
    "no-value": False,
}
autodoc_typehints = "none"
autodoc_inherit_docstrings = False
autodoc_type_aliases = {}

# Heavy/optional imports that must not break the docs build.
autodoc_mock_imports = ["cv2", "pydicom", "meshio", "PIL"]

intersphinx_mapping = {
    "python3": ("https://docs.python.org/3", None),
    "numpy": ("https://numpy.org/doc/stable", None),
    "jax": ("https://docs.jax.dev/en/latest", None),
    "matplotlib": ("https://matplotlib.org/stable", None),
}
