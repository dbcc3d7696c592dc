"""GeoLite2-City CSV-snapshot reader + range-lookup enrichment stage.

The reference keeps a MaxMind ``GeoLite2-City.mmdb`` fresh on disk and
looks rows up through the ``maxmind`` npm lib
(/root/reference/lib/parser/maxmind-update.js:24-93,
/root/reference/lib/plugins/output-filter/geoip.js:20-53). No network or
mmdb binary exists in this sandbox, so this module reads the OTHER
format MaxMind publishes for exactly this database — the documented
GeoLite2 CSV layout (``GeoLite2-City-Blocks-IPv4.csv`` +
``GeoLite2-City-Locations-en.csv``) — and compiles it into the sorted
range table the lookup actor broadcasts. Pointing ``blocks_csv`` /
``locations_csv`` at a real downloaded snapshot is the only change a
production deployment needs.

Scale shape: the real Blocks-IPv4 file is ~3M rows (~200 MB as numpy
arrays). Each lookup actor loads it ONCE in ``__init__`` (the per-node
mmdb-file pattern of the reference), or the driver loads it once and
broadcasts via ``ray.put`` — both supported; per-batch work is a
vectorized octet extract + one ``searchsorted``.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.csv as pacsv

# Column subset used from each file; names are the published GeoLite2
# CSV schema verbatim.
BLOCK_COLS = ["network", "geoname_id", "latitude", "longitude"]
LOC_COLS = ["geoname_id", "continent_code", "country_iso_code",
            "city_name"]


def load_geolite_city_csv(blocks_csv: str, locations_csv: str):
    """Compile a GeoLite2-City CSV snapshot into a sorted range table.

    Returns a dict of aligned numpy arrays sorted by ``start``:
    ``start``/``end`` (inclusive uint32 bounds of each CIDR block) and
    per-block ``country``/``city``/``continent``/``lat``/``lon``.
    Blocks whose geoname_id is missing keep null location fields, like
    the mmdb's anonymous ranges.
    """
    blocks = pacsv.read_csv(blocks_csv).select(BLOCK_COLS)
    locs = pacsv.read_csv(locations_csv).select(LOC_COLS)

    net = pc.cast(blocks["network"], pa.string())
    parts = pc.extract_regex(
        net, r"^(?P<a>\d+)\.(?P<b>\d+)\.(?P<c>\d+)\.(?P<d>\d+)/(?P<p>\d+)$")
    # rows whose network is not dotted-quad IPv4 (IPv6 blocks, truncated
    # lines) are SKIPPED, like the mmdb reader ignoring foreign records
    # — one bad row must not kill every lookup actor's __init__
    ok = pc.is_valid(parts)
    blocks = blocks.filter(ok)
    parts = pc.drop_null(parts.combine_chunks() if isinstance(
        parts, pa.ChunkedArray) else parts)
    octs = [pc.cast(pc.struct_field(parts, f), pa.int64()).to_numpy(
        zero_copy_only=False) for f in ("a", "b", "c", "d")]
    prefix = pc.cast(pc.struct_field(parts, "p"), pa.int64()).to_numpy(
        zero_copy_only=False)
    prefix = np.clip(prefix, 0, 32)
    start = ((octs[0] << 24) | (octs[1] << 16) | (octs[2] << 8) | octs[3]) \
        .astype(np.int64)
    size = (np.int64(1) << (32 - prefix)).astype(np.int64)
    end = start + size - 1

    # geoname join: blocks reference a locations row by id; vectorized
    # pandas map over the small locations side (per-row Python over the
    # ~3M-row real blocks file cost seconds in EVERY actor __init__)
    import pandas as pd
    gid = pd.Series(blocks["geoname_id"].to_numpy(zero_copy_only=False))
    ldf = locs.to_pandas().dropna(subset=["geoname_id"]) \
        .drop_duplicates("geoname_id").set_index("geoname_id")
    country = gid.map(ldf["country_iso_code"]).to_numpy(dtype=object)
    city = gid.map(ldf["city_name"]).to_numpy(dtype=object)
    continent = gid.map(ldf["continent_code"]).to_numpy(dtype=object)
    for arr in (country, city, continent):
        arr[pd.isna(arr)] = None

    order = np.argsort(start, kind="stable")
    return {
        "start": start[order], "end": end[order],
        "country": country[order], "city": city[order],
        "continent": continent[order],
        "lat": blocks["latitude"].to_numpy(zero_copy_only=False)[order],
        "lon": blocks["longitude"].to_numpy(zero_copy_only=False)[order],
    }


def _ips_to_int(ips: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """Vectorized dotted-quad -> int64 (-1 for null/malformed)."""
    parts = pc.extract_regex(
        pc.cast(ips, pa.string()),
        r"^(?P<a>\d{1,3})\.(?P<b>\d{1,3})\.(?P<c>\d{1,3})\.(?P<d>\d{1,3})$")
    ok = pc.is_valid(parts)
    vals = np.full(len(ok), -1, dtype=np.int64)
    if not pc.any(ok).as_py():
        return vals
    octs = []
    bad = np.zeros(len(ok), dtype=bool)
    for f in ("a", "b", "c", "d"):
        o = pc.cast(pc.fill_null(pc.struct_field(parts, f), "0"),
                    pa.int64()).to_numpy(zero_copy_only=False)
        bad |= o > 255
        octs.append(o)
    v = (octs[0] << 24) | (octs[1] << 16) | (octs[2] << 8) | octs[3]
    okm = ok.to_numpy(zero_copy_only=False) & ~bad
    vals[okm] = v[okm]
    return vals


class GeoCityEnricher:
    """Actor-pool geoip lookup over a compiled GeoLite2 range table
    (geoip.js:20-53 dataflow). Construct with csv paths, an
    ``mmdb_path`` (the binary artifact the reference actually ships —
    decoded by :mod:`.mmdb` into the same range table), or ``table_ref``
    (a ``ray.put`` of either loader's dict — one copy in the object
    store shared zero-ish-copy by every actor on a node)."""

    def __init__(self, blocks_csv: str | None = None,
                 locations_csv: str | None = None,
                 table_ref=None, ip_col: str = "client_ip",
                 mmdb_path: str | None = None):
        pa.set_cpu_count(1)
        self.ip_col = ip_col
        if table_ref is not None:
            import ray
            t = ray.get(table_ref)
        elif mmdb_path is not None:
            from .mmdb import load_maxmind_mmdb
            t = load_maxmind_mmdb(mmdb_path)
        else:
            t = load_geolite_city_csv(blocks_csv, locations_csv)
        self.t = t

    def __call__(self, batch: pa.Table) -> pa.Table:
        vals = _ips_to_int(batch[self.ip_col])
        idx = np.searchsorted(self.t["start"], vals, side="right") - 1
        ic = np.clip(idx, 0, len(self.t["start"]) - 1)
        # real snapshots have coverage gaps: require v <= end[block]
        hit = (idx >= 0) & (vals >= 0) & (vals <= self.t["end"][ic])
        out = batch
        for name, col in (("geo_country", "country"),
                          ("geo_city", "city"),
                          ("geo_continent", "continent")):
            vals_o = np.where(hit, self.t[col][ic], None)
            out = out.append_column(name, pa.array(vals_o.tolist(),
                                                   pa.string()))
        # geoip.js also surfaces the block's location (geoip.js:20-53);
        # emitting lat/lon means the compiled arrays earn their RAM
        for name, col in (("geo_lat", "lat"), ("geo_lon", "lon")):
            v = np.where(hit, self.t[col][ic].astype(np.float64), np.nan)
            out = out.append_column(
                name, pa.array(v, pa.float64(), mask=np.isnan(v)))
        return out


# --------------------------------------------------------------------
# Deterministic fixture snapshot in the exact published CSV layout —
# lets tests and the w_geo oracle agree on a closed-form mapping.

GEO_COUNTRIES = ["US", "DE", "JP", "BR", "AE", "ZA", "AU", "FR"]
GEO_CONTINENTS = ["NA", "EU", "AS", "SA", "AS", "AF", "OC", "EU"]
_FIXTURE_VERSION = "v1"


def ensure_geolite_fixture(root: str | None = None) -> tuple[str, str]:
    """Write (once) a 64-block full-coverage GeoLite2-City CSV snapshot:
    block i covers ``(4*i).0.0.0/6`` and maps to location ``1000+i%8``.
    Returns (blocks_csv, locations_csv)."""
    root = root or os.path.join(os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))), "fixtures", "geolite")
    os.makedirs(root, exist_ok=True)
    blocks = os.path.join(root, "GeoLite2-City-Blocks-IPv4.csv")
    locs = os.path.join(root, "GeoLite2-City-Locations-en.csv")
    done = os.path.join(root, f"_DONE_{_FIXTURE_VERSION}")
    if os.path.exists(done):
        return blocks, locs
    with open(blocks, "w") as f:
        f.write("network,geoname_id,registered_country_geoname_id,"
                "represented_country_geoname_id,is_anonymous_proxy,"
                "is_satellite_provider,postal_code,latitude,longitude,"
                "accuracy_radius\n")
        for i in range(64):
            f.write(f"{4 * i}.0.0.0/6,{1000 + i % 8},{1000 + i % 8},,0,0,,"
                    f"{10.0 + i % 8},{20.0 + i % 8},100\n")
    with open(locs, "w") as f:
        f.write("geoname_id,locale_code,continent_code,continent_name,"
                "country_iso_code,country_name,subdivision_1_iso_code,"
                "subdivision_1_name,subdivision_2_iso_code,"
                "subdivision_2_name,city_name,metro_code,time_zone,"
                "is_in_european_union\n")
        for j in range(8):
            f.write(f"{1000 + j},en,{GEO_CONTINENTS[j]},,"
                    f"{GEO_COUNTRIES[j]},,,,,,city-{j},,UTC,0\n")
    with open(done, "w") as f:
        f.write("ok\n")
    return blocks, locs
