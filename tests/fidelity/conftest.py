"""Fidelity suite: compare darsia_tpu against the reference CPU package."""

import pytest

from ._reference import load_reference


@pytest.fixture(scope="session")
def ref():
    """The reference darsia module, or skip if unavailable."""
    module = load_reference()
    if module is None:
        pytest.skip("reference implementation not available")
    return module
