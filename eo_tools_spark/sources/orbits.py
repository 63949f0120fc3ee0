"""Orbit-file (OSV) selection — the reference's orbit lookup with the
network fetch as an injectable seam.

The reference delegates to eodag's ``product.getOSV(orb_dir,
osvType=["POE", "RES"], returnMatch=True)``
(/root/reference/eo_tools/S1/core.py:228-240) and then branches on
whether the returned path contains ``POEORB`` or ``RESORB``, raising
``RuntimeError("No orbit file available for this product")`` when
nothing matches. The SELECTION rules themselves are the public
Copernicus/ESA auxiliary-file conventions (also what eodag implements):

- filenames encode mission, type, generation time, and validity window:
  ``S1A_OPER_AUX_POEORB_OPOD_20200101T120000_V20191231T225942_20200102T005942.EOF``
- a file COVERS an acquisition when validity_start ≤ acq_start and
  acq_stop ≤ validity_stop for the same mission (S1A/S1B/...)
- precise orbits (``POEORB``) are preferred over restituted
  (``RESORB``); within a type the LATEST generation time wins
  (reprocessed orbit files supersede earlier ones).

Everything above is pure logic and implemented here; actually obtaining
the file list / bytes is the seam (``lister`` / ``fetcher`` callables —
in the reference these are the eodag catalog + download)."""

from __future__ import annotations

import re
from datetime import datetime
from typing import Any, Callable, Sequence

_EOF_RE = re.compile(
    r"^(?P<mission>S1[A-Z])_OPER_AUX_(?P<otype>POEORB|RESORB)_OPOD_"
    r"(?P<gen>\d{8}T\d{6})_V(?P<vstart>\d{8}T\d{6})_(?P<vstop>\d{8}T\d{6})"
    r"\.(?:EOF|zip)$",
    re.IGNORECASE,
)


def _ts(s: str) -> datetime:
    return datetime.strptime(s, "%Y%m%dT%H%M%S")


def parse_orbit_name(name: str) -> dict[str, Any] | None:
    """Parse one EOF/zip orbit filename; None when it isn't one."""
    m = _EOF_RE.match(name.rsplit("/", 1)[-1])
    if not m:
        return None
    return {
        "name": name,
        "mission": m.group("mission").upper(),
        "type": m.group("otype").upper(),
        "generated": _ts(m.group("gen")),
        "validity_start": _ts(m.group("vstart")),
        "validity_stop": _ts(m.group("vstop")),
    }


def select_orbit_file(
    names: Sequence[str],
    mission: str,
    acq_start: datetime,
    acq_stop: datetime,
    osv_types: Sequence[str] = ("POEORB", "RESORB"),
) -> str:
    """Pick THE orbit file for an acquisition window out of a candidate
    list (core.py:228-231 semantics): mission match + validity coverage,
    ``osv_types`` in preference order (default precise-then-restituted,
    the reference's ``osvType=["POE", "RES"]``), latest generation wins
    within a type. Raises the reference's RuntimeError when nothing
    qualifies (core.py:231: "No orbit file available for this
    product")."""
    parsed = [p for p in (parse_orbit_name(n) for n in names) if p]
    covering = [
        p for p in parsed
        if p["mission"] == mission.upper()
        and p["validity_start"] <= acq_start
        and acq_stop <= p["validity_stop"]
    ]
    for otype in (t.upper() for t in osv_types):
        cands = [p for p in covering if p["type"] == otype]
        if cands:
            return max(cands, key=lambda p: (p["generated"], p["name"]))["name"]
    raise RuntimeError("No orbit file available for this product")


def fetch_orbit(
    mission: str,
    acq_start: datetime,
    acq_stop: datetime,
    lister: Callable[[], Sequence[str]] | None = None,
    fetcher: Callable[[str], bytes] | None = None,
) -> dict:
    """End-to-end orbit lookup with the network as a seam: ``lister()``
    returns candidate filenames (the catalog query), ``fetcher(name)``
    returns the EOF bytes (the download). Selection and parsing
    (`annotation.parse_orbit_eof`) run here. Raises NotImplementedError
    without the seams (no network in this environment — SURVEY §7)."""
    if lister is None or fetcher is None:
        raise NotImplementedError(
            "No network access in this environment: pass lister= and "
            "fetcher= to resolve orbit files (deployment seam)."
        )
    from eo_tools_spark.sources.annotation import parse_orbit_eof

    name = select_orbit_file(lister(), mission, acq_start, acq_stop)
    return parse_orbit_eof(fetcher(name).decode())
