"""Execute every ``python`` code block in docs/tutorials/*.md.

The tutorials are the narrative learning path (docs/tutorials/index.md);
running their blocks in order per page guarantees the prose can't rot
(the reference runs its tutorial notebooks in CI the same way). Blocks
fenced ```python tpu``` need TPU hardware and are skipped here.
"""

from __future__ import annotations

import os
import pathlib
import re

import pytest

TUTORIALS = sorted(
    (pathlib.Path(__file__).resolve().parents[1] / "docs" / "tutorials")
    .glob("[0-9]*.md")
)

_FENCE = re.compile(r"```(\w+)([^\n]*)\n(.*?)```", re.S)


def _blocks(path):
    out = []
    for lang, info, body in _FENCE.findall(path.read_text()):
        if lang == "python" and "tpu" not in info:
            out.append(body)
    return out


@pytest.mark.parametrize("path", TUTORIALS, ids=lambda p: p.stem)
def test_tutorial_blocks_execute(path, tmp_path, monkeypatch):
    blocks = _blocks(path)
    assert blocks, f"{path.name} has no executable python blocks"
    monkeypatch.chdir(tmp_path)
    # plots must not require a display
    import matplotlib

    matplotlib.use("Agg")
    ns: dict = {"__name__": f"tutorial_{path.stem}"}
    for i, src in enumerate(blocks):
        try:
            exec(compile(src, f"{path.name}[block {i}]", "exec"), ns)
        except Exception as err:  # pragma: no cover - failure reporting
            pytest.fail(
                f"{path.name} block {i} failed: {type(err).__name__}: {err}"
                f"\n--- block ---\n{src}"
            )
    import matplotlib.pyplot as plt

    plt.close("all")


def test_docs_site_builds(tmp_path):
    """The static-site generator renders every docs page with highlighted
    code and rewritten intra-site links."""
    import sys

    sys.path.insert(0, str(
        pathlib.Path(__file__).resolve().parents[1] / "tools"
    ))
    import build_docs

    n = build_docs.build(tmp_path / "site")
    assert n >= 15
    page = (tmp_path / "site" / "tutorials" /
            "01_getting_started.html").read_text()
    assert "codehilite" in page              # highlighted code
    assert "02_differentiable_ray_tracing.html" in page  # .md -> .html links
    assert (tmp_path / "site" / "index.html").exists()
