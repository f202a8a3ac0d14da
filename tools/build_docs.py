"""Build the markdown docs to HTML and check internal links.

The reference builds Sphinx/RTD docs in CI
(``/root/reference/.github/workflows/build-documentation.yml``); this
package's docs are plain markdown, so the CI equivalent renders them
with python-markdown (if available) and — always — validates that
every relative link/anchor in ``docs/*.md``, ``README.md`` and
``CLAUDE.md`` points at an existing file.

Usage: python tools/build_docs.py [--check] [--out build/docs]
"""

import os
import re
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

LINK_RE = re.compile(r"\[[^\]]*\]\(([^)#]+)(#[^)]*)?\)")


def doc_files():
    out = [os.path.join(ROOT, "README.md")]
    claude = os.path.join(ROOT, "CLAUDE.md")  # link-checked, not rendered
    if os.path.exists(claude):
        out.append(claude)
    d = os.path.join(ROOT, "docs")
    for f in sorted(os.listdir(d)):
        if f.endswith(".md"):
            out.append(os.path.join(d, f))
    return out


def check_links():
    bad = []
    for path in doc_files():
        base = os.path.dirname(path)
        text = open(path, encoding="utf-8").read()
        for m in LINK_RE.finditer(text):
            target = m.group(1).strip()
            if re.match(r"^[a-z]+://", target) or target.startswith("mailto:"):
                continue
            tpath = os.path.normpath(os.path.join(base, target))
            if not os.path.exists(tpath):
                bad.append((os.path.relpath(path, ROOT), target))
    return bad


def build_html(outdir):
    try:
        import markdown
    except ImportError:
        print("python-markdown not installed; skipping HTML render")
        return 0
    os.makedirs(outdir, exist_ok=True)
    n = 0
    for path in doc_files():
        name = os.path.splitext(os.path.basename(path))[0] + ".html"
        html = markdown.markdown(
            open(path, encoding="utf-8").read(),
            extensions=["tables", "fenced_code"],
        )
        with open(os.path.join(outdir, name), "w", encoding="utf-8") as f:
            f.write(
                "<!doctype html><meta charset='utf-8'>"
                f"<title>{name}</title>{html}"
            )
        n += 1
    print(f"rendered {n} pages -> {outdir}")
    return n


def main(argv=None):
    argv = sys.argv[1:] if argv is None else argv
    outdir = os.path.join(ROOT, "build", "docs")
    if "--out" in argv:
        outdir = argv[argv.index("--out") + 1]
    bad = check_links()
    if bad:
        for path, target in bad:
            print(f"BROKEN LINK in {path}: {target}")
        sys.exit(1)
    print(f"{len(doc_files())} docs, all relative links resolve")
    build_html(outdir)


if __name__ == "__main__":
    main()
