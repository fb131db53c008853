"""The static documentation site builds and is internally consistent.

The rendered-docs analog of the reference's Sphinx build
(reference ``docs/Makefile`` + ``.github/workflows``): every markdown
page and runnable example renders to HTML, the sidebar reaches every
page, and no internal link is broken.
"""

import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO / "docs"))

import build_docs  # noqa: E402


def test_docs_build(tmp_path):
    written = build_docs.build(tmp_path)
    names = {p.name for p in written}
    # Every declared markdown page and every example rendered.
    for _, stem, _ in build_docs.PAGES:
        assert f"{stem}.html" in names
    examples = sorted((REPO / "examples").glob("*.py"))
    assert examples, "examples/ directory is empty?"
    for ex in examples:
        assert f"example_{ex.stem}.html" in names
    assert len(written) == len(build_docs.PAGES) + len(examples)

    # No broken internal links; every page carries the sidebar and exactly
    # one 'current' highlight.
    for page in written:
        text = page.read_text()
        assert text.count('class="current"') == 1, page.name
        for href in re.findall(r'href="([^"]+)"', text):
            if href.startswith(("http://", "https://", "#", "mailto:")):
                continue
            target = href.split("#")[0]
            assert (tmp_path / target).exists(), (page.name, href)

    # Markdown actually rendered (headings became <h*>, fences became
    # highlighted blocks) rather than being passed through as text.
    index = (tmp_path / "index.html").read_text()
    assert "<h1" in index and "<h2" in index
    api = (tmp_path / "api.html").read_text()
    assert "codehilite" in api or "highlight" in api
    # Example pages embed the (highlighted) source and its docstring.
    ex_page = (tmp_path / f"example_{examples[0].stem}.html").read_text()
    assert "highlight" in ex_page
