"""Shared SCALING.md section splice used by the scale-probe tools.

Each probe owns one '## ...' section of SCALING.md and rewrites ONLY that
section on re-run (marker .. next '## ' heading), preserving sections
other tools appended before or after it. Extracted from the three
identical copies in containment_probe / dedup_scale_probe /
simhash_scale_probe (r8 review) so splice edge-case fixes propagate.
"""

from __future__ import annotations


def replace_section(md_path: str, marker: str, lines: list[str]) -> None:
    """Replace the section starting at ``marker`` (a ``"\\n## ..."``
    heading prefix) with ``lines``, appending at the end of the file.
    The section extends to the next ``"\\n## "`` heading or EOF."""
    with open(md_path) as f:
        doc = f.read()
    # a section sitting at the very start of the file has no leading
    # newline, so the "\n## ..."-prefixed find would miss it and each
    # re-run would append a duplicate section (r8 ADVICE)
    if doc.startswith(marker.lstrip("\n")):
        start = 0
    else:
        start = doc.find(marker)
    if start != -1:
        nxt = doc.find("\n## ", start + 1)
        doc = doc[:start] + (doc[nxt:] if nxt != -1 else "")
    with open(md_path, "w") as f:
        f.write(doc.rstrip("\n") + "\n" + "\n".join(lines) + "\n")
