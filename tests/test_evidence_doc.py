"""Evidence-document integrity: PARITY_RESULTS.md keeps all its sections.

Round 2's clobbering rebuild silently erased the attribution/per-object/
full-system/narrative sections for five commits. The document is now
assembled from per-producer section files (scripts/parity_md.py); this test
pins (a) the assembler semantics and (b) the committed document's structure,
so a future producer regression fails CI instead of shipping a gutted doc.
"""

import importlib.util
import os

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_parity_md():
    spec = importlib.util.spec_from_file_location(
        "parity_md", os.path.join(ROOT, "scripts", "parity_md.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_assembler_preserves_other_sections(tmp_path):
    md = _load_parity_md()
    out = tmp_path / "DOC.md"

    def assemble():
        return md.assemble(str(tmp_path), out_path=str(out))

    md.write_section(str(tmp_path), "e2e",
                     "## Full-system (detector-in-the-loop) evaluation\nB")
    md.write_section(str(tmp_path), "base", "# Accuracy-parity evidence\nA")
    assemble()
    text = out.read_text()
    # order follows SECTIONS, not write order
    assert text.index("# Accuracy-parity") < text.index("## Full-system")

    # re-writing one section never clobbers the others
    md.write_section(str(tmp_path), "base", "# Accuracy-parity evidence\nA2")
    assemble()
    text = out.read_text()
    assert "A2" in text and "## Full-system" in text and "B" in text


def test_committed_document_has_all_sections():
    md = _load_parity_md()
    with open(os.path.join(ROOT, "PARITY_RESULTS.md")) as f:
        text = f.read()
    for name, header in md.SECTIONS:
        assert header in text, f"PARITY_RESULTS.md lost its '{name}' section ({header!r})"
    # every section has a source file, so any single producer can re-run
    sdir = os.path.join(ROOT, "parity", "sections")
    for name, _ in md.SECTIONS:
        assert os.path.exists(os.path.join(sdir, f"{name}.md")), name
