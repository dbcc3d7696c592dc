"""GeoLite2 CSV snapshot reader + range lookup (maxmind-update.js:24-93,
geoip.js:20-53 rebuilt over MaxMind's published CSV layout). Ray-free:
the enricher is a plain callable class."""

import numpy as np
import pyarrow as pa

from logagent_js_ray.sources.geolite import (
    GEO_COUNTRIES, GeoCityEnricher, _ips_to_int, ensure_geolite_fixture,
    load_geolite_city_csv)


def test_ips_to_int_vectorized():
    vals = _ips_to_int(pa.array([
        "1.2.3.4", None, "999.1.1.1", "not an ip", "255.255.255.255"]))
    assert vals.tolist() == [(1 << 24) + (2 << 16) + (3 << 8) + 4,
                             -1, -1, -1, (1 << 32) - 1]


def test_load_and_lookup(tmp_path):
    blocks, locs = ensure_geolite_fixture(str(tmp_path))
    t = load_geolite_city_csv(blocks, locs)
    assert len(t["start"]) == 64
    assert t["start"][0] == 0 and t["end"][0] == (1 << 26) - 1
    # block i=17 -> 68.0.0.0/6 -> location 1000 + 17%8=1 -> DE
    enr = GeoCityEnricher(blocks, locs)
    out = enr(pa.table({"client_ip": pa.array(
        ["68.1.2.3", "0.0.0.1", "bogus", None], pa.string())}))
    assert out["geo_country"].to_pylist() == ["DE", "US", None, None]
    assert out["geo_city"].to_pylist() == ["city-1", "city-0", None, None]
    assert out["geo_continent"].to_pylist() == ["EU", "NA", None, None]


def test_coverage_gaps(tmp_path):
    # a snapshot with holes: IPs between blocks must miss, exactly like
    # mmdb lookups returning no record
    b = tmp_path / "b.csv"
    l = tmp_path / "l.csv"
    b.write_text("network,geoname_id,registered_country_geoname_id,"
                 "represented_country_geoname_id,is_anonymous_proxy,"
                 "is_satellite_provider,postal_code,latitude,longitude,"
                 "accuracy_radius\n"
                 "10.0.0.0/8,7,7,,0,0,,1.0,2.0,50\n"
                 "192.168.0.0/16,8,8,,0,0,,3.0,4.0,50\n")
    l.write_text("geoname_id,locale_code,continent_code,continent_name,"
                 "country_iso_code,country_name,subdivision_1_iso_code,"
                 "subdivision_1_name,subdivision_2_iso_code,"
                 "subdivision_2_name,city_name,metro_code,time_zone,"
                 "is_in_european_union\n"
                 "7,en,NA,,US,,,,,,denver,,UTC,0\n"
                 "8,en,EU,,DE,,,,,,berlin,,UTC,0\n")
    enr = GeoCityEnricher(str(b), str(l))
    out = enr(pa.table({"client_ip": pa.array(
        ["10.255.0.1", "11.0.0.1", "192.168.44.5", "192.169.0.1"],
        pa.string())}))
    assert out["geo_city"].to_pylist() == ["denver", None, "berlin", None]


def test_fixture_mapping_matches_formula(tmp_path):
    # the closed-form the w_geo oracle uses: first octet o -> block o//4
    # -> country[(o//4) % 8]
    blocks, locs = ensure_geolite_fixture(str(tmp_path))
    enr = GeoCityEnricher(blocks, locs)
    ips = [f"{o}.9.9.9" for o in range(0, 256, 17)]
    out = enr(pa.table({"client_ip": pa.array(ips, pa.string())}))
    expect = [GEO_COUNTRIES[(o // 4) % 8] for o in range(0, 256, 17)]
    assert out["geo_country"].to_pylist() == expect


def test_geolite_skips_malformed_network_rows(tmp_path):
    # an IPv6 / truncated row must be skipped, not kill the actor init
    from logagent_js_ray.sources.geolite import load_geolite_city_csv
    blocks = tmp_path / "b.csv"
    blocks.write_text(
        "network,geoname_id,registered_country_geoname_id,"
        "represented_country_geoname_id,is_anonymous_proxy,"
        "is_satellite_provider,postal_code,latitude,longitude,"
        "accuracy_radius\n"
        "1.0.0.0/24,1000,,,0,0,,1.0,2.0,10\n"
        "2001:db8::/32,1000,,,0,0,,1.0,2.0,10\n"
        "8.8.8.0/24,1001,,,0,0,,3.0,4.0,10\n")
    locs = tmp_path / "l.csv"
    locs.write_text(
        "geoname_id,locale_code,continent_code,continent_name,"
        "country_iso_code,country_name,subdivision_1_iso_code,"
        "subdivision_1_name,subdivision_2_iso_code,subdivision_2_name,"
        "city_name,metro_code,time_zone,is_in_european_union\n"
        "1000,en,OC,,AU,,,,,,Sydney,,UTC,0\n"
        "1001,en,NA,,US,,,,,,Mountain View,,UTC,0\n")
    t = load_geolite_city_csv(str(blocks), str(locs))
    assert len(t["start"]) == 2  # IPv6 row skipped
    assert set(t["country"]) == {"AU", "US"}
