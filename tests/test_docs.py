"""Docs-as-tests: every ```python snippet in README/docs must actually run.

The analogue of the reference's ``documentation/`` test package, which
executes README snippets to keep prose and API in sync (SURVEY.md §4
"Docs-as-tests").
"""

import pathlib
import re

import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow

ROOT = pathlib.Path(__file__).resolve().parent.parent
DOC_FILES = [ROOT / "README.md", *sorted((ROOT / "docs").glob("*.md"))]
_BLOCK = re.compile(r"```python\n(.*?)```", re.DOTALL)


def _snippets():
    for path in DOC_FILES:
        for i, m in enumerate(_BLOCK.finditer(path.read_text())):
            yield pytest.param(m.group(1), id=f"{path.name}-{i}")


@pytest.mark.parametrize("code", _snippets())
def test_doc_snippet_runs(code, monkeypatch):
    import jax

    import vectorwave_tpu as vw
    from vectorwave_tpu import cost_model

    # Docs deliberately elide signal setup; provide the free names they use.
    sig = jnp.asarray(np.random.default_rng(0).standard_normal(512))
    namespace = {
        "jax": jax,
        "my_signal": np.asarray(sig),
        "x": sig,
        "x_even": sig[:256],
    }
    # calibrate() measures the device at many sizes; one small size is enough
    # to prove the documented call works.
    real_calibrate = cost_model.calibrate
    monkeypatch.setattr(
        cost_model, "calibrate",
        lambda sizes=(256,), **kw: real_calibrate(sizes=sizes, **kw),
    )
    monkeypatch.setattr(vw.cost_model, "calibrate", cost_model.calibrate)
    try:
        exec(compile(code, "<doc-snippet>", "exec"), namespace)
    finally:
        vw.set_backend("auto")
