"""Build the documentation site: docs/**/*.md -> docs/site/**/*.html.

mkdocs/sphinx are not installable in this environment, so this is a
self-contained static-site generator on the stdlib-adjacent ``markdown``
+ ``pygments`` packages (both present): fenced code blocks are
syntax-highlighted, tables render, intra-site ``.md`` links rewrite to
``.html``, and every page gets a navigation sidebar generated from the
docs tree.

Usage: python tools/build_docs.py  [--out docs/site]
"""

from __future__ import annotations

import argparse
import os
import pathlib
import re
import shutil

import markdown

ROOT = pathlib.Path(__file__).resolve().parents[1]
DOCS = ROOT / "docs"

_EXTENSIONS = ["fenced_code", "codehilite", "tables", "toc"]
_EXT_CONF = {"codehilite": {"guess_lang": False, "noclasses": False}}

_PAGE = """<!DOCTYPE html>
<html lang="en">
<head>
<meta charset="utf-8">
<meta name="viewport" content="width=device-width, initial-scale=1">
<title>{title} — optiland_tpu</title>
<style>{css}</style>
</head>
<body>
<nav>
<p class="brand"><a href="{rel}index.html">optiland_tpu</a></p>
{nav}
</nav>
<main>
{body}
</main>
</body>
</html>
"""

_CSS = """
:root { --fg:#1c2733; --bg:#ffffff; --accent:#226699; --line:#dde4ea; }
* { box-sizing:border-box; }
body { margin:0; display:flex; font:16px/1.6 system-ui,sans-serif;
       color:var(--fg); background:var(--bg); }
nav { width:260px; min-height:100vh; padding:18px 16px; flex-shrink:0;
      border-right:1px solid var(--line); font-size:14px; }
nav .brand { font-weight:700; font-size:16px; }
nav a { color:var(--accent); text-decoration:none; }
nav ul { list-style:none; padding-left:12px; margin:4px 0; }
nav li { margin:2px 0; }
nav .sect { font-weight:600; margin-top:12px; color:#445; }
main { max-width:860px; padding:28px 40px 80px; }
h1,h2,h3 { line-height:1.25; }
h1 { border-bottom:2px solid var(--line); padding-bottom:8px; }
a { color:var(--accent); }
code { background:#f2f5f8; padding:1px 4px; border-radius:3px;
       font-size:0.92em; }
pre { background:#f6f8fa; border:1px solid var(--line); border-radius:6px;
      padding:12px 14px; overflow-x:auto; line-height:1.45; }
pre code { background:none; padding:0; }
table { border-collapse:collapse; margin:12px 0; }
th,td { border:1px solid var(--line); padding:5px 10px; }
th { background:#f2f5f8; }
"""


def _pygments_css():
    try:
        from pygments.formatters import HtmlFormatter

        return HtmlFormatter(style="default").get_style_defs(".codehilite")
    except Exception:  # pragma: no cover
        return ""


def _collect():
    """Ordered list of (source md, site-relative html path, title)."""
    pages = []
    for path in sorted(DOCS.rglob("*.md")):
        if "site" in path.parts or "api" in path.parts:
            continue
        rel = path.relative_to(DOCS).with_suffix(".html")
        title = path.stem.replace("_", " ")
        for line in path.read_text().splitlines():
            if line.startswith("# "):
                title = line[2:].strip()
                break
        pages.append((path, rel, title))
    return pages


def _nav_html(pages, current_rel):
    depth = len(current_rel.parts) - 1
    prefix = "../" * depth
    groups: dict[str, list] = {}
    for _, rel, title in pages:
        group = rel.parts[0] if len(rel.parts) > 1 else ""
        groups.setdefault(group, []).append((rel, title))
    out = []
    for group in sorted(groups, key=lambda g: (g != "", g)):
        if group:
            out.append(f'<p class="sect">{group}</p>')
        out.append("<ul>")
        for rel, title in groups[group]:
            cls = ' class="here"' if rel == current_rel else ""
            out.append(
                f'<li{cls}><a href="{prefix}{rel.as_posix()}">'
                f"{title}</a></li>"
            )
        out.append("</ul>")
    return "\n".join(out)


def _rewrite_links(html, current_rel):
    """Point intra-docs .md links at the rendered .html pages."""

    def repl(m):
        href = m.group(1)
        if href.startswith(("http:", "https:", "#", "mailto:")):
            return m.group(0)
        base, _, frag = href.partition("#")
        if not base.endswith(".md"):
            return m.group(0)
        new = re.sub(r"\.md$", ".html", base)
        return m.group(0).replace(href, new + ("#" + frag if frag else ""))

    return re.sub(r'href="([^"]+)"', repl, html)


def build(out_dir):
    out = pathlib.Path(out_dir)
    if out.exists():
        shutil.rmtree(out)
    out.mkdir(parents=True)
    css = _CSS + "\n" + _pygments_css()
    pages = _collect()
    for path, rel, title in pages:
        md = markdown.Markdown(
            extensions=_EXTENSIONS, extension_configs=_EXT_CONF
        )
        body = md.convert(path.read_text())
        depth = len(rel.parts) - 1
        html = _PAGE.format(
            title=title,
            css=css,
            nav=_nav_html(pages, rel),
            body=body,
            rel="../" * depth,
        )
        html = _rewrite_links(html, rel)
        dest = out / rel
        dest.parent.mkdir(parents=True, exist_ok=True)
        dest.write_text(html)
    print(f"built {len(pages)} pages -> {out}")
    return len(pages)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=str(DOCS / "site"))
    args = ap.parse_args()
    build(args.out)
