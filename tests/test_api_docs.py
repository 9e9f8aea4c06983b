"""Generated API reference stays fresh (tools/gen_api_docs.py).

The Sphinx-autodoc equivalent: editing a public docstring or signature
without regenerating docs/api_generated/ fails here, exactly like a CI
docs build. Regenerate with ``python tools/gen_api_docs.py``.
"""

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))

GENERATED = os.path.join(REPO, "docs", "api_generated")


def test_generated_docs_are_fresh(tmp_path):
    import gen_api_docs

    fresh = gen_api_docs.generate(str(tmp_path))
    assert len(fresh) > 20               # every module got a page
    for path in fresh:
        name = os.path.basename(path)
        checked_in = os.path.join(GENERATED, name)
        assert os.path.exists(checked_in), \
            f"missing generated page {name}; run tools/gen_api_docs.py"
        with open(path) as a, open(checked_in) as b:
            assert a.read() == b.read(), \
                (f"{name} is stale; regenerate with "
                 "`python tools/gen_api_docs.py`")


def test_every_public_name_is_documented():
    """No public module member renders as *(undocumented)* — the
    pydocstyle-grade completeness check at the rendered-docs level."""
    import gen_api_docs

    offenders = []
    for modname in gen_api_docs.iter_modules():
        md = gen_api_docs.document_module(modname)
        for line in md.splitlines():
            if "*(undocumented)*" in line:
                offenders.append(f"{modname}: {line.strip()[:70]}")
    assert not offenders, "\n".join(offenders)
