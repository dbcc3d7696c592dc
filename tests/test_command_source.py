import datetime


def test_command_now_substitution(ray_session):
    from logagent_js_ray.sources.command_source import read_command
    now = datetime.datetime(2024, 5, 6, 7, 8, 9)
    ds = read_command("echo run-at-$NOW; echo second", now)
    rows = sorted(r["text"] for r in ds.take_all())
    assert rows == ["run-at-2024-05-06T07:08:09", "second"]
    assert ds.take(1)[0]["logSource"].startswith("echo run-at-")


def test_command_query_time_watermark(ray_session, tmp_path):
    from logagent_js_ray.sources.command_source import read_command
    from logagent_js_ray.sources.sql_source import Watermark
    wm = Watermark(str(tmp_path / "wm.txt"))
    now1 = datetime.datetime(2024, 1, 2, 3, 0, 0)
    ds = read_command("echo since=$QUERY_TIME", now1, watermark=wm)
    assert [r["text"] for r in ds.take_all()] == \
        ["since=2001-01-01T00:00:00"]  # century default (command.js:26)
    now2 = datetime.datetime(2024, 1, 2, 4, 0, 0)
    ds2 = read_command("echo since=$QUERY_TIME", now2, watermark=wm)
    assert [r["text"] for r in ds2.take_all()] == \
        ["since=2024-01-02T03:00:00"]  # advanced to the prior run's now


def test_command_stderr_opt_in(ray_session):
    from logagent_js_ray.sources.command_source import read_command
    now = datetime.datetime(2024, 1, 1)
    quiet = read_command("echo out; echo err 1>&2", now)
    assert [r["text"] for r in quiet.take_all()] == ["out"]
    loud = read_command("echo out; echo err 1>&2", now,
                        include_stderr=True)
    assert sorted(r["text"] for r in loud.take_all()) == ["err", "out"]


def test_command_failure_does_not_advance_watermark(ray_session, tmp_path):
    from logagent_js_ray.sources.command_source import read_command
    from logagent_js_ray.sources.sql_source import Watermark
    wm = Watermark(str(tmp_path / "wm.txt"))
    now1 = datetime.datetime(2024, 1, 2, 3, 0, 0)
    read_command("echo ok since=$QUERY_TIME", now1, watermark=wm)
    now2 = datetime.datetime(2024, 1, 2, 4, 0, 0)
    ds = read_command("echo partial since=$QUERY_TIME; exit 3", now2,
                      watermark=wm)
    assert [r["text"] for r in ds.take_all()] == \
        ["partial since=2024-01-02T03:00:00"]
    # failed poll: watermark still at the last SUCCESSFUL run's now
    assert wm.read() == "2024-01-02T03:00:00"


def test_command_single_giant_line_kept(ray_session):
    from logagent_js_ray.sources.command_source import read_command
    now = datetime.datetime(2024, 1, 1)
    ds = read_command("printf 'xxxxxxxxxxxxxxxxxxxx'", now, max_buffer=8)
    assert [r["text"] for r in ds.take_all()] == ["xxxxxxxx"]
