#!/usr/bin/env python
"""Static documentation site builder — the analog of the reference's Quarto
pipeline (reference `_quarto.yml:1-24`): renders README.md and docs/*.md to
a styled HTML site under ``docs/_site/`` with code highlighting, a shared
nav bar, and intra-site links rewritten.  Pure-stdlib + python-markdown +
pygments (both in the base image); run via ``make docs``.
"""
from __future__ import annotations

import pathlib
import re
import shutil
import sys

import markdown

ROOT = pathlib.Path(__file__).resolve().parent.parent
OUT = ROOT / "docs" / "_site"

PAGES = [
    ("index", ROOT / "README.md", "Home"),
    ("tutorial", ROOT / "docs" / "tutorial.md", "Tutorial"),
    ("api", ROOT / "docs" / "api.md", "API"),
    ("parity", ROOT / "docs" / "PARITY.md", "Reference parity"),
    ("perf_notes", ROOT / "docs" / "perf_notes.md", "Performance notes"),
    ("contributing", ROOT / "CONTRIBUTING.md", "Contributing"),
]

CSS = """
body { font: 16px/1.6 system-ui, sans-serif; margin: 0; color: #1a1a2e; }
.nav { background: #16213e; padding: 0.6rem 1.2rem; }
.nav a { color: #e8e8f0; text-decoration: none; margin-right: 1.2rem;
         font-weight: 500; }
.nav a.active { border-bottom: 2px solid #7fb3ff; }
main { max-width: 54rem; margin: 0 auto; padding: 1rem 1.5rem 4rem; }
pre { background: #f4f5f8; padding: 0.8rem 1rem; overflow-x: auto;
      border-radius: 6px; font-size: 0.88em; }
code { background: #f4f5f8; padding: 0.1em 0.3em; border-radius: 3px;
       font-size: 0.92em; }
pre code { background: none; padding: 0; }
table { border-collapse: collapse; margin: 1rem 0; }
th, td { border: 1px solid #d6d9e0; padding: 0.35rem 0.7rem;
         text-align: left; }
th { background: #eef1f6; }
h1, h2, h3 { line-height: 1.25; }
a { color: #2454a4; }
.codehilite .k, .codehilite .kn { color: #7c3aed; }
.codehilite .s, .codehilite .s1, .codehilite .s2 { color: #0f766e; }
.codehilite .c, .codehilite .c1 { color: #8a8f98; font-style: italic; }
"""

TEMPLATE = """<!doctype html>
<html lang="en"><head><meta charset="utf-8">
<meta name="viewport" content="width=device-width, initial-scale=1">
<title>{title} — bodge_tpu</title>
<link rel="stylesheet" href="style.css"></head>
<body><nav class="nav">{nav}</nav>
<main>{body}</main></body></html>
"""


def build() -> int:
    OUT.mkdir(parents=True, exist_ok=True)
    (OUT / "style.css").write_text(CSS)
    md = markdown.Markdown(
        extensions=["fenced_code", "codehilite", "tables", "toc"],
        extension_configs={"codehilite": {"guess_lang": False}},
    )
    built = 0
    for slug, src, label in PAGES:
        if not src.exists():
            print(f"skip {src} (missing)", file=sys.stderr)
            continue
        text = src.read_text()
        # Rewrite intra-repo doc links to the rendered pages.
        for other_slug, other_src, _ in PAGES:
            rel = other_src.name
            text = re.sub(
                rf"\((?:\./)?(?:docs/)?{re.escape(rel)}(#[^)]*)?\)",
                rf"({other_slug}.html\1)",
                text,
            )
        nav = "".join(
            f'<a href="{s}.html"{" class=active" if s == slug else ""}>{l}</a>'
            for s, p, l in PAGES if p.exists()
        )
        md.reset()
        html = TEMPLATE.format(title=label, nav=nav, body=md.convert(text))
        (OUT / f"{slug}.html").write_text(html)
        built += 1
        print(f"built docs/_site/{slug}.html")
    return 0 if built else 1


if __name__ == "__main__":
    sys.exit(build())
