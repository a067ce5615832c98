"""Section-file assembly for PARITY_RESULTS.md.

Round 2 lost the evidence document's richest sections to a clobbering
rebuild: parity_run.write_markdown opened the assembled file "w" while the
other producers appended, so any re-run of the base table silently erased
attribution/per-object/full-system/narrative content. Here every producer
owns ONE section file under <workdir>/sections/, and the assembled
PARITY_RESULTS.md is always regenerated from whichever sections exist —
re-running any single producer refreshes its section without touching the
others. tests/test_evidence_doc.py asserts the assembled document keeps all
expected section headers.
"""

import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# assembly order; each entry is (section file stem, required header to pin)
SECTIONS = [
    ("base", "# Accuracy-parity evidence"),
    ("attribution", "## Component attribution"),
    ("e2e", "## Full-system (detector-in-the-loop) evaluation"),
    ("multiobj", "### Multi-object frames"),
    ("selection", "## Checkpoint-selection study"),
    ("serving", "## Serving-mode accuracy gates"),
    ("narrative", "## Reading the tables"),
    ("ablation", "## Ablation:"),
    ("diagnosis", "## The rgbd fusion stall"),
    ("symmetric", "## Symmetric objects"),
]


def section_dir(workdir: str) -> str:
    return os.path.join(workdir, "sections")


def write_section(workdir: str, name: str, text: str) -> str:
    """Write one section file and reassemble the document."""
    assert name in {n for n, _ in SECTIONS}, name
    d = section_dir(workdir)
    os.makedirs(d, exist_ok=True)
    path = os.path.join(d, f"{name}.md")
    with open(path, "w") as f:
        f.write(text if text.endswith("\n") else text + "\n")
    assemble(workdir)
    return path


def assemble(workdir: str, out_path: str | None = None) -> str:
    """Concatenate existing section files into PARITY_RESULTS.md.

    Only the canonical evidence tree (REPO/parity) assembles into the
    repo-root document; any other workdir (tests, scratch runs) assembles
    into <workdir>/PARITY_RESULTS.md so it can never clobber committed
    evidence.
    """
    if out_path is None:
        canonical = os.path.abspath(workdir) == os.path.join(REPO, "parity")
        out_path = (os.path.join(REPO, "PARITY_RESULTS.md") if canonical
                    else os.path.join(workdir, "PARITY_RESULTS.md"))
    parts = []
    for name, _ in SECTIONS:
        p = os.path.join(section_dir(workdir), f"{name}.md")
        if os.path.exists(p):
            with open(p) as f:
                parts.append(f.read().rstrip() + "\n")
    with open(out_path, "w") as f:
        f.write("\n".join(parts))
    return out_path
