"""Scalar geo/misc functions (SURVEY.md J7, S8).

Pure JVM column expressions; no join engine or external service involved.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def haversine_km(lat1: Column, lon1: Column, lat2: Column, lon2: Column) -> Column:
    """Great-circle distance in km (reference: matching.pyc
    ``haversine_distance`` — radians/sin/asin/sqrt form)."""
    rlat1, rlat2 = F.radians(lat1), F.radians(lat2)
    dlat = F.radians(lat2 - lat1) / 2
    dlon = F.radians(lon2 - lon1) / 2
    a = F.sin(dlat) ** 2 + F.cos(rlat1) * F.cos(rlat2) * F.sin(dlon) ** 2
    return F.lit(2.0 * 6371.0) * F.asin(F.sqrt(a))


def canonicalize_url(url: Column) -> Column:
    """Deterministic URL canonicalization (reference analog: OSRM map-
    matching snapped coordinates, matching.pyc ``map_match`` — an external
    service there, a pure function here per SURVEY S8):
    lowercase scheme+host, strip fragment, strip trailing slash on a bare
    path, drop default ports. Pure JVM regex — runs scan-side."""
    u = F.regexp_replace(url, r"#.*$", "")  # strip fragment
    # lowercase scheme+authority only (path case is significant)
    scheme = F.lower(F.regexp_extract(u, r"^([a-zA-Z]+)://", 1))
    host = F.lower(F.regexp_extract(u, r"^[a-zA-Z]+://([^/:?]+)", 1))
    port = F.regexp_extract(u, r"^[a-zA-Z]+://[^/:?]+:(\d+)", 1)
    rest = F.regexp_extract(u, r"^[a-zA-Z]+://[^/?]+([/?].*)?$", 1)
    keep_port = (
        ~(((scheme == "http") & (port == "80")) | ((scheme == "https") & (port == "443")))
        & (port != "")
    )
    out = F.concat(
        scheme, F.lit("://"), host,
        F.when(keep_port, F.concat(F.lit(":"), port)).otherwise(F.lit("")),
        F.when(rest == "/", F.lit("")).otherwise(rest),
    )
    return F.when(url.rlike(r"^[a-zA-Z]+://"), out).otherwise(url)
