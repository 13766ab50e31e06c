"""Reference-parity input fixtures shipped as package data.

The reference pipeline's entry point is a live HTTP scrape of an XML
sanctions feed plus PDF notices (reference main.py:72-146, 202-247).
This sandbox has no network, so the canonical small feed/notice pair
lives INSIDE the package (not under tests/) and installs with the
wheel — a site-packages install of the library can still run
``pipeline_e2e`` / ``xml_*`` / ``pdf_chunk_extract``.

Resolution order for :func:`fixture_path`:

1. ``$SANCTIONS_FIXTURES_DIR/<name>`` if the env var is set (the
   injectable path a real deployment uses to point at downloaded
   feeds);
2. the packaged copy next to this module.
"""

from __future__ import annotations

import os


def fixture_path(name: str) -> str:
    """Absolute path of a named fixture (feed.xml, travel_ban.txt, ...)."""
    override = os.environ.get("SANCTIONS_FIXTURES_DIR")
    if override:
        cand = os.path.join(override, name)
        if os.path.exists(cand):
            return cand
    return os.path.join(os.path.dirname(os.path.abspath(__file__)), name)
