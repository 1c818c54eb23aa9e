#!/usr/bin/env python
"""Generate docs/API_REFERENCE.md from the package's docstrings.

The reference ships generated pdoc HTML (reference docs/index.html); pdoc
is not available in this environment, so this is a small dependency-free
equivalent: it imports every module under volume_segmantics_tpu, walks the
public surface (module docstring, classes with their public methods,
functions, dataclass fields), and emits one markdown file with signatures
and full docstrings. Regenerate after API changes:

    VOLSEG_TPU_PLATFORM=cpu python tools/gen_api_docs.py

CI-checkable: runs deterministically, so `git diff --exit-code docs/`
after regeneration catches drift.
"""

import dataclasses
import importlib
import inspect
import pkgutil
import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import volume_segmantics_tpu as pkg

OUT = Path(__file__).resolve().parent.parent / "docs" / "API_REFERENCE.md"

# Modules that require optional heavy deps or multi-process context are
# still documented if importable; failures are listed at the end.


def _signature(obj) -> str:
    try:
        sig = str(inspect.signature(obj))
    except (ValueError, TypeError):
        return "(...)"
    # Default-value reprs of plain objects (e.g. flax's module _Sentinel)
    # embed the process's heap addresses; scrub them so regeneration is
    # byte-identical across runs (the CI drift check diffs this file).
    return re.sub(r" at 0x[0-9a-fA-F]+", " at 0x...", sig)


def _doc(obj) -> str:
    doc = inspect.getdoc(obj)
    if not doc:
        return ""
    # Auto-generated dataclass docstrings repeat the signature (see
    # _signature for why the addresses must go).
    return re.sub(r" at 0x[0-9a-fA-F]+", " at 0x...", doc.strip())


def _is_public(name: str) -> bool:
    return not name.startswith("_")


def _iter_modules():
    yield pkg.__name__
    for info in pkgutil.walk_packages(pkg.__path__, prefix=pkg.__name__ + "."):
        yield info.name


def _document_class(cls, lines):
    lines.append(f"### class `{cls.__name__}{_signature(cls)}`\n")
    doc = _doc(cls)
    if doc:
        lines.append(doc + "\n")
    if dataclasses.is_dataclass(cls):
        fields = dataclasses.fields(cls)
        if fields:
            lines.append("**Fields:**\n")
            for f in fields:
                t = getattr(f.type, "__name__", str(f.type))
                lines.append(f"- `{f.name}: {t}`")
            lines.append("")
    def _documented_here(name):
        """Own methods, plus public methods inherited from PRIVATE package
        bases (e.g. dataclasses sharing a _Base.from_mapping): those have
        no public home of their own, so they are documented on each public
        subclass."""
        if name in cls.__dict__:
            return True
        for c in cls.__mro__[1:]:
            if name in c.__dict__:
                return c.__name__.startswith("_") and c.__module__.startswith(
                    pkg.__name__
                )
        return False

    methods = [
        (n, m)
        for n, m in inspect.getmembers(cls)
        if _is_public(n)
        and (inspect.isfunction(m) or inspect.ismethod(m))
        and _documented_here(n)
    ]
    for n, m in methods:
        lines.append(f"#### `{cls.__name__}.{n}{_signature(m)}`\n")
        mdoc = _doc(m)
        if mdoc:
            lines.append(mdoc + "\n")
    # Classmethods/staticmethods not caught above
    for n, raw in cls.__dict__.items():
        if _is_public(n) and isinstance(raw, (classmethod, staticmethod)):
            fn = raw.__func__
            kind = "classmethod" if isinstance(raw, classmethod) else "staticmethod"
            lines.append(
                f"#### `{cls.__name__}.{n}{_signature(fn)}` *({kind})*\n"
            )
            mdoc = _doc(fn)
            if mdoc:
                lines.append(mdoc + "\n")


def main():
    lines = [
        "# API reference",
        "",
        "*Generated from docstrings by `tools/gen_api_docs.py` — do not edit"
        " by hand; regenerate after API changes.*",
        "",
    ]
    failures = []
    for mod_name in _iter_modules():
        try:
            mod = importlib.import_module(mod_name)
        except Exception as e:  # pragma: no cover - optional deps
            failures.append((mod_name, repr(e)))
            continue
        public_classes = [
            c
            for n, c in inspect.getmembers(mod, inspect.isclass)
            if _is_public(n) and c.__module__ == mod_name
        ]
        public_fns = [
            f
            for n, f in inspect.getmembers(mod, inspect.isfunction)
            if _is_public(n) and f.__module__ == mod_name
        ]
        moddoc = _doc(mod)
        if not (public_classes or public_fns or moddoc):
            continue
        lines.append(f"## `{mod_name}`\n")
        if moddoc:
            lines.append(moddoc + "\n")
        for cls in public_classes:
            _document_class(cls, lines)
        for fn in public_fns:
            lines.append(f"### `{fn.__name__}{_signature(fn)}`\n")
            fdoc = _doc(fn)
            if fdoc:
                lines.append(fdoc + "\n")
    if failures:
        lines.append("## Modules not importable in this environment\n")
        for name, err in failures:
            lines.append(f"- `{name}`: {err}")
        lines.append("")
    OUT.write_text("\n".join(lines) + "\n")
    print(f"wrote {OUT} ({OUT.stat().st_size} bytes, "
          f"{len(failures)} import failures)")
    render_html()


_HTML_STYLE = """\
body { max-width: 60em; margin: 2em auto; padding: 0 1em;
       font: 16px/1.55 system-ui, sans-serif; color: #1a1a1a; }
code { background: #f2f2f4; padding: .1em .3em; border-radius: 3px;
       font-size: .92em; }
pre > code { display: block; padding: .8em; overflow-x: auto; }
h2 { border-bottom: 1px solid #ddd; padding-bottom: .2em; margin-top: 2em; }
h3, h4 { margin-top: 1.4em; }
a { color: #0b5fa5; }
"""


def render_html() -> None:
    """Render docs/API_REFERENCE.md to docs/api/index.html — the browsable
    equivalent of the reference's pdoc site (reference docs/
    volume_segmantics/index.html), built in CI by docs.yml. Deterministic
    (pure function of the markdown), so the docs drift check covers it."""
    try:
        import markdown
    except ImportError:  # pragma: no cover - env without markdown
        print("markdown package unavailable; skipping HTML render")
        return
    html_dir = OUT.parent / "api"
    html_dir.mkdir(exist_ok=True)
    body = markdown.markdown(
        OUT.read_text(), extensions=["fenced_code", "tables"]
    )
    page = (
        "<!DOCTYPE html>\n<html lang=\"en\"><head><meta charset=\"utf-8\">\n"
        "<meta name=\"viewport\" content=\"width=device-width, initial-scale=1\">\n"
        "<title>volume_segmantics_tpu API reference</title>\n"
        f"<style>\n{_HTML_STYLE}</style></head>\n<body>\n{body}\n</body></html>\n"
    )
    out = html_dir / "index.html"
    out.write_text(page)
    print(f"wrote {out} ({out.stat().st_size} bytes)")


if __name__ == "__main__":
    main()
