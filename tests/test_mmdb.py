"""MaxMind DB binary reader tests: a minimal spec-compliant mmdb WRITER
lives here (tests only) so the reader in logagent_js_ray/sources/mmdb.py
is exercised against real bytes — tree records at 24 and 28 bits,
ip_version 4 and 6 (v4-in-v6 under ::/96), pointer records, and a full
cross-format parity check against the GeoLite2 CSV loader."""

import struct

import numpy as np
import pytest


# ------------------------------------------------------- tiny writer

def enc_string(s: str) -> bytes:
    b = s.encode()
    assert len(b) < 29
    return bytes([(2 << 5) | len(b)]) + b


def enc_double(x: float) -> bytes:
    return bytes([(3 << 5) | 8]) + struct.pack(">d", x)


def enc_uint(n: int, typ: int = 6) -> bytes:
    b = n.to_bytes((n.bit_length() + 7) // 8, "big") if n else b""
    return bytes([(typ << 5) | len(b)]) + b


def enc_map(items: dict[str, bytes]) -> bytes:
    assert len(items) < 29
    out = bytearray([(7 << 5) | len(items)])
    for k, v in items.items():
        out += enc_string(k) + v
    return bytes(out)


def geo_record(country, city, continent, lat, lon) -> bytes:
    return enc_map({
        "country": enc_map({"iso_code": enc_string(country)}),
        "city": enc_map({"names": enc_map({"en": enc_string(city)})}),
        "continent": enc_map({"code": enc_string(continent)}),
        "location": enc_map({"latitude": enc_double(lat),
                             "longitude": enc_double(lon)}),
    })


class _Node:
    __slots__ = ("kids",)

    def __init__(self):
        self.kids = [None, None]  # None | _Node | ("data", idx)


def build_mmdb(networks, records, record_size=24, ip_version=4) -> bytes:
    """networks: list of (cidr 'a.b.c.d/p', record_idx); records: list of
    encoded data records. Returns the full mmdb byte string."""
    root = _Node()
    total_bits = 32 if ip_version == 4 else 128
    for cidr, ridx in networks:
        ip, p = cidr.split("/")
        a, b, c, d = (int(x) for x in ip.split("."))
        v = (a << 24) | (b << 16) | (c << 8) | d
        p = int(p)
        if ip_version == 6:  # v4 space under ::/96
            p += 96
        node = root
        for depth in range(p):
            bit = (v >> (31 - (depth - (96 if ip_version == 6 else 0)))) \
                & 1 if depth >= (96 if ip_version == 6 else 0) else 0
            if depth == p - 1:
                node.kids[bit] = ("data", ridx)
            else:
                if not isinstance(node.kids[bit], _Node):
                    node.kids[bit] = _Node()
                node = node.kids[bit]
    # BFS numbering
    order = [root]
    i = 0
    while i < len(order):
        for k in order[i].kids:
            if isinstance(k, _Node):
                order.append(k)
        i += 1
    num = {id(n): j for j, n in enumerate(order)}
    node_count = len(order)
    # data section with per-record offsets
    data = bytearray()
    offs = []
    for r in records:
        offs.append(len(data))
        data += r

    def rec_val(kid) -> int:
        if kid is None:
            return node_count
        if isinstance(kid, _Node):
            return num[id(kid)]
        return node_count + 16 + offs[kid[1]]

    tree = bytearray()
    for n in order:
        left, right = rec_val(n.kids[0]), rec_val(n.kids[1])
        if record_size == 24:
            tree += left.to_bytes(3, "big") + right.to_bytes(3, "big")
        elif record_size == 28:
            tree += (left & 0xFFFFFF).to_bytes(3, "big")
            tree += bytes([((left >> 24) << 4) | (right >> 24)])
            tree += (right & 0xFFFFFF).to_bytes(3, "big")
        elif record_size == 32:
            tree += left.to_bytes(4, "big") + right.to_bytes(4, "big")
        else:
            raise ValueError(record_size)
    meta = enc_map({
        "binary_format_major_version": enc_uint(2, 5),
        "binary_format_minor_version": enc_uint(0, 5),
        "node_count": enc_uint(node_count),
        "record_size": enc_uint(record_size, 5),
        "ip_version": enc_uint(ip_version, 5),
        "database_type": enc_string("GeoLite2-City"),
    })
    from logagent_js_ray.sources.mmdb import METADATA_MARKER
    return bytes(tree) + b"\x00" * 16 + bytes(data) + \
        METADATA_MARKER + meta


RECORDS = [
    geo_record("US", "city-a", "NA", 10.5, -20.25),
    geo_record("DE", "city-b", "EU", 48.0, 11.5),
]
NETS = [("1.0.0.0/8", 0), ("2.2.0.0/16", 1)]


@pytest.mark.parametrize("record_size,ip_version",
                         [(24, 4), (28, 4), (32, 4), (24, 6), (28, 6)])
def test_mmdb_reader_roundtrip(tmp_path, record_size, ip_version):
    from logagent_js_ray.sources.mmdb import load_maxmind_mmdb
    path = tmp_path / f"t{record_size}v{ip_version}.mmdb"
    path.write_bytes(build_mmdb(NETS, RECORDS, record_size, ip_version))
    t = load_maxmind_mmdb(str(path))
    assert len(t["start"]) == 2
    assert t["start"][0] == 1 << 24 and t["end"][0] == (2 << 24) - 1
    assert t["start"][1] == (2 << 24) | (2 << 16)
    assert t["end"][1] == t["start"][1] + (1 << 16) - 1
    assert list(t["country"]) == ["US", "DE"]
    assert list(t["city"]) == ["city-a", "city-b"]
    assert list(t["continent"]) == ["NA", "EU"]
    assert t["lat"][0] == 10.5 and t["lon"][0] == -20.25


def test_mmdb_enricher_lookup(tmp_path):
    import pyarrow as pa
    from logagent_js_ray.sources.geolite import GeoCityEnricher
    path = tmp_path / "t.mmdb"
    path.write_bytes(build_mmdb(NETS, RECORDS, 24, 6))
    e = GeoCityEnricher(mmdb_path=str(path), ip_col="ip")
    out = e(pa.table({"ip": pa.array(
        ["1.2.3.4", "2.2.200.1", "9.9.9.9", None, "bogus"])}))
    assert out["geo_country"].to_pylist() == ["US", "DE", None, None, None]
    assert out["geo_city"].to_pylist() == [
        "city-a", "city-b", None, None, None]
    assert out["geo_lat"].to_pylist()[:2] == [10.5, 48.0]


def test_mmdb_matches_csv_loader(tmp_path):
    """Cross-format parity: an mmdb holding the CSV fixture's 64-block
    layout must compile to the IDENTICAL range table the CSV loader
    builds — both ingest paths feed the same lookup stage."""
    from logagent_js_ray.sources.geolite import (GEO_CONTINENTS,
                                                 GEO_COUNTRIES,
                                                 ensure_geolite_fixture,
                                                 load_geolite_city_csv)
    from logagent_js_ray.sources.mmdb import load_maxmind_mmdb
    blocks, locs = ensure_geolite_fixture()
    csv_t = load_geolite_city_csv(blocks, locs)
    recs = [geo_record(GEO_COUNTRIES[j], f"city-{j}", GEO_CONTINENTS[j],
                       10.0 + j, 20.0 + j) for j in range(8)]
    nets = [(f"{4 * i}.0.0.0/6", i % 8) for i in range(64)]
    path = tmp_path / "parity.mmdb"
    path.write_bytes(build_mmdb(nets, recs, 28, 6))
    mm_t = load_maxmind_mmdb(str(path))
    assert np.array_equal(csv_t["start"], mm_t["start"])
    assert np.array_equal(csv_t["end"], mm_t["end"])
    for k in ("country", "city", "continent"):
        assert list(csv_t[k]) == list(mm_t[k])
    assert np.allclose(csv_t["lat"].astype(float), mm_t["lat"])
    assert np.allclose(csv_t["lon"].astype(float), mm_t["lon"])


def test_mmdb_v6_data_record_above_v4_subtree(tmp_path):
    """A data record met DURING the ::/96 descent (e.g. at ::/1) covers
    a prefix containing all of IPv4 — it must map to the full v4 range,
    not be discarded (review regression)."""
    from logagent_js_ray.sources.mmdb import METADATA_MARKER, \
        load_maxmind_mmdb
    rec = geo_record("US", "city-a", "NA", 1.0, 2.0)
    node_count = 1
    # single node: left = data pointer (node_count + 16 + 0), right=empty
    left, right = node_count + 16 + 0, node_count
    tree = left.to_bytes(3, "big") + right.to_bytes(3, "big")
    meta = enc_map({
        "binary_format_major_version": enc_uint(2, 5),
        "binary_format_minor_version": enc_uint(0, 5),
        "node_count": enc_uint(node_count),
        "record_size": enc_uint(24, 5),
        "ip_version": enc_uint(6, 5),
        "database_type": enc_string("GeoLite2-City"),
    })
    path = tmp_path / "shallow.mmdb"
    path.write_bytes(tree + b"\x00" * 16 + rec + METADATA_MARKER + meta)
    t = load_maxmind_mmdb(str(path))
    assert list(t["start"]) == [0]
    assert list(t["end"]) == [(1 << 32) - 1]
    assert list(t["country"]) == ["US"]
