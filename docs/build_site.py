"""Build a static HTML docs site from docs/*.md + docs/api/*.md.

The deployable-site counterpart of the reference's Documenter
``deploydocs(branch="gh-pages")`` (/root/reference/docs/make.jl:21-24,
.github/workflows/docs.yml) — the CI docs job runs this and publishes the
output directory with actions/upload-pages-artifact + deploy-pages.

Dependency-free on purpose (no markdown package in the minimal CI env): a
small renderer covering the constructs these docs use — headings, fenced
code blocks, inline code, bold/italic, links, lists, tables, paragraphs.

Usage: python docs/build_site.py [outdir]   (default docs/_site)
"""

from __future__ import annotations

import html
import os
import re
import sys

HERE = os.path.dirname(os.path.abspath(__file__))

_PAGE = """<!doctype html>
<html lang="en"><head><meta charset="utf-8">
<meta name="viewport" content="width=device-width, initial-scale=1">
<title>{title} — igdm_tpu</title>
<style>
body{{max-width:56rem;margin:2rem auto;padding:0 1rem;font:16px/1.6 system-ui,sans-serif;color:#1a202c}}
pre{{background:#f6f8fa;padding:.8rem;overflow-x:auto;border-radius:6px;font-size:87%}}
code{{background:#f6f8fa;padding:.1em .3em;border-radius:4px;font-size:90%}}
pre code{{background:none;padding:0}}
table{{border-collapse:collapse;display:block;overflow-x:auto}}
th,td{{border:1px solid #d0d7de;padding:.3em .6em;text-align:left}}
a{{color:#0b60c4}} nav{{margin-bottom:1.5rem;font-size:90%}}
h1,h2,h3{{line-height:1.25}}
</style></head><body>
<nav><a href="{root}index.html">igdm_tpu docs</a> · <a href="{root}api/index.html">API reference</a></nav>
{body}
</body></html>
"""


def _inline(text: str) -> str:
    text = html.escape(text, quote=False)
    text = re.sub(r"`([^`]+)`", r"<code>\1</code>", text)
    text = re.sub(r"\*\*([^*]+)\*\*", r"<strong>\1</strong>", text)
    text = re.sub(
        r"\[([^\]]+)\]\(([^)\s]+)\)",
        lambda m: '<a href="{}">{}</a>'.format(
            re.sub(r"\.md(#.*)?$", lambda mm: ".html" + (mm.group(1) or ""), m.group(2)),
            m.group(1),
        ),
        text,
    )
    return text


def md_to_html(md: str) -> str:
    out: list[str] = []
    lines = md.splitlines()
    i = 0
    para: list[str] = []
    in_list = False

    def flush_para():
        nonlocal in_list
        if in_list:
            out.append("</ul>")
            in_list = False
        if para:
            out.append("<p>" + _inline(" ".join(para)) + "</p>")
            para.clear()

    while i < len(lines):
        line = lines[i]
        if line.startswith("```"):
            flush_para()
            block = []
            i += 1
            while i < len(lines) and not lines[i].startswith("```"):
                block.append(lines[i])
                i += 1
            out.append("<pre><code>" + html.escape("\n".join(block)) + "</code></pre>")
        elif re.match(r"#{1,6} ", line):
            flush_para()
            level = len(line) - len(line.lstrip("#"))
            out.append(f"<h{level}>{_inline(line[level + 1:])}</h{level}>")
        elif line.startswith("|") and i + 1 < len(lines) and re.match(r"\|[\s:|-]+\|", lines[i + 1]):
            flush_para()
            cells = [c.strip() for c in line.strip("|").split("|")]
            rows = ["<tr>" + "".join(f"<th>{_inline(c)}</th>" for c in cells) + "</tr>"]
            i += 2
            while i < len(lines) and lines[i].startswith("|"):
                cells = [c.strip() for c in lines[i].strip("|").split("|")]
                rows.append("<tr>" + "".join(f"<td>{_inline(c)}</td>" for c in cells) + "</tr>")
                i += 1
            i -= 1
            out.append("<table>" + "".join(rows) + "</table>")
        elif re.match(r"\s*[*-] ", line):
            if para:
                flush_para()
            if not in_list:
                out.append("<ul>")
                in_list = True
            item = [re.sub(r"^\s*[*-] ", "", line)]
            while i + 1 < len(lines) and re.match(r"\s{2,}\S", lines[i + 1]):
                item.append(lines[i + 1].strip())
                i += 1
            out.append("<li>" + _inline(" ".join(item)) + "</li>")
        elif not line.strip():
            flush_para()
        else:
            para.append(line.strip())
        i += 1
    flush_para()
    return "\n".join(out)


def build(outdir: str) -> list[str]:
    pages = []
    for sub in ("", "api"):
        src = os.path.join(HERE, sub) if sub else HERE
        dst = os.path.join(outdir, sub) if sub else outdir
        os.makedirs(dst, exist_ok=True)
        root = "../" if sub else ""
        for fname in sorted(os.listdir(src)):
            if not fname.endswith(".md"):
                continue
            with open(os.path.join(src, fname)) as fh:
                md = fh.read()
            m = re.search(r"^# (.+)$", md, re.M)
            title = m.group(1) if m else fname[:-3]
            page = os.path.join(dst, fname[:-3] + ".html")
            with open(page, "w") as fh:
                fh.write(_PAGE.format(title=html.escape(title), body=md_to_html(md), root=root))
            pages.append(page)
    # top-level index: link every page
    idx = os.path.join(outdir, "index.html")
    if not os.path.exists(idx):
        links = "".join(
            f'<li><a href="{os.path.relpath(p, outdir)}">{os.path.relpath(p, outdir)[:-5]}</a></li>'
            for p in pages
        )
        with open(idx, "w") as fh:
            fh.write(_PAGE.format(title="igdm_tpu", body=f"<h1>igdm_tpu documentation</h1><ul>{links}</ul>", root=""))
        pages.append(idx)
    return pages


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(HERE, "_site")
    pages = build(out)
    print(f"built {len(pages)} pages into {out}")
