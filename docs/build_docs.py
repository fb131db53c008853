"""Static HTML documentation builder for superscreen_tpu.

Renders the markdown documentation set (``README.md``, ``docs/*.md``,
``COMPONENTS.md``) and every runnable example (``examples/*.py``) into a
self-contained static site at ``docs/_build/html`` -- no network, no
Sphinx, only the stdlib plus the ``markdown`` and ``pygments`` packages
baked into the environment.  This is the rendered-docs analog of the
reference's Sphinx site (``/root/reference/docs/``): same material
(tutorial-style examples + API reference + physics background), built
with a ~300-line generator instead of a framework dependency.

Usage::

    python docs/build_docs.py [--out docs/_build/html]

The build is deterministic and tested (``tests/test_docs_build.py``
asserts every page renders and every internal link resolves), so CI keeps
the site green alongside the code.
"""

from __future__ import annotations

import argparse
import ast
import html
import os
import re
import shutil
from pathlib import Path

import markdown
from pygments import highlight
from pygments.formatters import HtmlFormatter
from pygments.lexers import PythonLexer

REPO = Path(__file__).resolve().parent.parent

#: Markdown pages (source path relative to repo root -> output stem).
#: Order defines the sidebar.
PAGES = [
    ("README.md", "index", "Overview"),
    ("docs/API.md", "api", "API reference"),
    ("docs/BACKGROUND.md", "background", "Physics background"),
    ("docs/TPU_DESIGN.md", "tpu_design", "TPU-first design"),
    ("docs/COUPLING.md", "coupling", "Inter-film coupling"),
    ("docs/DIFFERENTIABLE.md", "differentiable", "Differentiable solves"),
    ("docs/SCANNING.md", "scanning", "Scanning & imaging"),
    ("docs/MIGRATING.md", "migrating", "Migrating from SuperScreen"),
    ("COMPONENTS.md", "components", "Reference parity map"),
    ("docs/REPRODUCIBILITY.md", "reproducibility", "Benchmark reproducibility"),
    ("docs/CHANGELOG.md", "changelog", "Changelog"),
]

CSS = """
:root {
  --fg: #1a1d23; --bg: #ffffff; --muted: #5b6470; --line: #e3e6ea;
  --accent: #0b5fa5; --code-bg: #f6f8fa; --sidebar-bg: #f9fafb;
}
* { box-sizing: border-box; }
body {
  margin: 0; color: var(--fg); background: var(--bg);
  font: 16px/1.6 -apple-system, "Segoe UI", Roboto, Helvetica, Arial,
        sans-serif;
}
.layout { display: flex; min-height: 100vh; }
nav.sidebar {
  width: 250px; flex: none; padding: 1.2rem 1rem; border-right: 1px solid
  var(--line); background: var(--sidebar-bg); position: sticky; top: 0;
  height: 100vh; overflow-y: auto;
}
nav.sidebar h1 { font-size: 1.05rem; margin: 0 0 .8rem; }
nav.sidebar h2 {
  font-size: .72rem; letter-spacing: .08em; text-transform: uppercase;
  color: var(--muted); margin: 1.2rem 0 .3rem;
}
nav.sidebar a {
  display: block; padding: .18rem .4rem; border-radius: 5px;
  color: var(--fg); text-decoration: none; font-size: .92rem;
}
nav.sidebar a:hover { background: #eef1f4; }
nav.sidebar a.current { background: #e4edf5; color: var(--accent);
  font-weight: 600; }
main {
  flex: 1; min-width: 0; max-width: 60rem; padding: 2rem 2.6rem 4rem;
}
main h1, main h2, main h3 { line-height: 1.25; scroll-margin-top: 1rem; }
main h1 { border-bottom: 1px solid var(--line); padding-bottom: .4rem; }
main a { color: var(--accent); }
main img { max-width: 100%; }
pre {
  background: var(--code-bg); border: 1px solid var(--line);
  border-radius: 8px; padding: .85rem 1rem; overflow-x: auto;
  font-size: .86rem; line-height: 1.5;
}
code {
  font-family: ui-monospace, SFMono-Regular, Menlo, Consolas, monospace;
  font-size: .88em; background: var(--code-bg); padding: .08em .3em;
  border-radius: 4px;
}
pre code { background: none; padding: 0; font-size: inherit; }
table { border-collapse: collapse; display: block; overflow-x: auto; }
th, td { border: 1px solid var(--line); padding: .35rem .6rem;
  font-size: .92rem; }
th { background: var(--sidebar-bg); text-align: left; }
blockquote { border-left: 3px solid var(--line); margin: 0;
  padding: 0 1rem; color: var(--muted); }
.docstring {
  border-left: 3px solid var(--accent); background: var(--sidebar-bg);
  padding: .7rem 1.1rem; margin-bottom: 1.4rem; border-radius: 0 8px 8px 0;
}
footer { margin-top: 3rem; color: var(--muted); font-size: .85rem;
  border-top: 1px solid var(--line); padding-top: .8rem; }
"""

TEMPLATE = """<!DOCTYPE html>
<html lang="en">
<head>
<meta charset="utf-8">
<meta name="viewport" content="width=device-width, initial-scale=1">
<title>{title} &mdash; superscreen_tpu</title>
<style>{css}</style>
<style>{pygments_css}</style>
</head>
<body>
<div class="layout">
<nav class="sidebar">
<h1>superscreen_tpu</h1>
<h2>Documentation</h2>
{nav_pages}
<h2>Examples</h2>
{nav_examples}
</nav>
<main>
{body}
<footer>superscreen_tpu &mdash; TPU-native superconducting-film
magnetostatics. Built from the repository markdown by
<code>docs/build_docs.py</code>.</footer>
</main>
</div>
</body>
</html>
"""


def _md_converter() -> markdown.Markdown:
    return markdown.Markdown(
        extensions=["fenced_code", "codehilite", "tables", "toc"],
        extension_configs={
            "codehilite": {"guess_lang": False},
            "toc": {"permalink": False},
        },
    )


def _rewrite_links(text_html: str, stem_by_source: dict) -> str:
    """Point intra-repo markdown links at their rendered pages."""

    def repl(m):
        href = m.group(1)
        base, frag = (href.split("#", 1) + [""])[:2]
        # Normalize relative references like ./API.md, docs/API.md, API.md.
        key = base.lstrip("./")
        for source, stem in stem_by_source.items():
            if key == source or key == os.path.basename(source):
                tail = f"#{frag}" if frag else ""
                return f'href="{stem}.html{tail}"'
        return m.group(0)

    return re.sub(r'href="([^"]+\.md(?:#[^"]*)?)"', repl, text_html)


def _example_pages() -> list:
    """(source path, output stem, title, module docstring, code) for every
    example, sorted by filename."""
    out = []
    for path in sorted((REPO / "examples").glob("*.py")):
        source = path.read_text()
        doc = ast.get_docstring(ast.parse(source)) or ""
        title = path.stem.replace("_", " ")
        # First docstring line makes a better title when present.
        if doc.strip():
            title = doc.strip().splitlines()[0].rstrip(".")
        out.append((path, f"example_{path.stem}", title, doc, source))
    return out


def _nav_html(pages, examples, current_stem):
    def link(stem, label):
        cls = ' class="current"' if stem == current_stem else ""
        return f'<a href="{stem}.html"{cls}>{html.escape(label)}</a>'

    nav_pages = "\n".join(link(stem, label) for _, stem, label in pages)
    nav_examples = "\n".join(
        link(stem, title) for _, stem, title, _, _ in examples
    )
    return nav_pages, nav_examples


def build(out_dir: Path) -> list:
    """Builds the site; returns the list of written page paths."""
    out_dir.mkdir(parents=True, exist_ok=True)
    formatter = HtmlFormatter(style="default")
    pygments_css = formatter.get_style_defs(".codehilite, .highlight")
    examples = _example_pages()
    stem_by_source = {src: stem for src, stem, _ in PAGES}
    written = []

    for source, stem, label in PAGES:
        md = _md_converter()
        body = md.convert((REPO / source).read_text())
        body = _rewrite_links(body, stem_by_source)
        nav_pages, nav_examples = _nav_html(examples=examples, pages=PAGES,
                                            current_stem=stem)
        page = TEMPLATE.format(
            title=html.escape(label), css=CSS, pygments_css=pygments_css,
            nav_pages=nav_pages, nav_examples=nav_examples, body=body,
        )
        path = out_dir / f"{stem}.html"
        path.write_text(page)
        written.append(path)

    lexer = PythonLexer()
    for path_src, stem, title, doc, source in examples:
        nav_pages, nav_examples = _nav_html(examples=examples, pages=PAGES,
                                            current_stem=stem)
        doc_html = (
            f'<div class="docstring">{_md_converter().convert(doc)}</div>'
            if doc.strip()
            else ""
        )
        code_html = highlight(source, lexer, formatter)
        body = (
            f"<h1>{html.escape(title)}</h1>\n{doc_html}\n"
            f"<p><code>examples/{path_src.name}</code> &mdash; runnable "
            f"as <code>python examples/{path_src.name}</code>.</p>\n"
            f"{code_html}"
        )
        page = TEMPLATE.format(
            title=html.escape(title), css=CSS, pygments_css=pygments_css,
            nav_pages=nav_pages, nav_examples=nav_examples, body=body,
        )
        path = out_dir / f"{stem}.html"
        path.write_text(page)
        written.append(path)
    return written


def main():
    parser = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    parser.add_argument(
        "--out", default=str(REPO / "docs" / "_build" / "html"),
        help="output directory (default: docs/_build/html)",
    )
    parser.add_argument(
        "--clean", action="store_true",
        help="remove the output directory first",
    )
    args = parser.parse_args()
    out_dir = Path(args.out)
    if args.clean and out_dir.exists():
        shutil.rmtree(out_dir)
    written = build(out_dir)
    print(f"wrote {len(written)} pages to {out_dir}")


if __name__ == "__main__":
    main()
