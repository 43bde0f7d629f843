import datetime

from erex.labels import inverse_tlink
from erex.rules.timex_algebra import (date_components, java_week_monday,
                                      timex_timex_rule, week_dates)


def rule(t1, t2, dct="1989-10-26", identity=False):
    (ty1, v1), (ty2, v2) = t1, t2
    return timex_timex_rule("tmxA", ty1, v1, False, "tmxB", ty2, v2, False,
                            dct, identity)


D = "DATE"
T = "TIME"


def test_equal_dates_identity_downgrade():
    assert rule((D, "1989-10-26"), (D, "1989-10-26")) == "SIMULTANEOUS"
    assert rule((D, "1989-10-26"), (D, "1989-10-26"),
                identity=True) == "IDENTITY"


def test_substring_containment():
    assert rule((D, "1989-10"), (D, "1989-10-26")) == "INCLUDES"
    assert rule((D, "1989-10-26"), (D, "1989-10")) == "IS_INCLUDED"
    assert rule((D, "1989"), (D, "1989-10-26")) == "INCLUDES"


def test_date_ordering():
    assert rule((D, "1989-10-25"), (D, "1989-10-26")) == "BEFORE"
    assert rule((D, "1989-11-01"), (D, "1989-10-26")) == "AFTER"
    assert rule((D, "1988-12-31"), (D, "1989-01-01")) == "BEFORE"
    # same year, month-only vs full date in a different month
    assert rule((D, "1989-09"), (D, "1989-10-26")) == "BEFORE"
    assert rule((D, "1989-11"), (D, "1989-10-26")) == "AFTER"


def test_quarters():
    assert rule((D, "1989-Q1"), (D, "1989-05-01")) == "BEFORE"
    assert rule((D, "1989-Q2"), (D, "1989-05-01")) == "INCLUDES"
    assert rule((D, "1989-05-01"), (D, "1989-Q2")) == "IS_INCLUDED"
    assert rule((D, "1989-Q2"), (D, "1989-Q2"),
                identity=True) == "IDENTITY"
    assert rule((D, "1989-Q1"), (D, "1989-Q3")) == "BEFORE"


def test_decades_centuries():
    assert rule((D, "198X"), (D, "1985")) == "INCLUDES"
    assert rule((D, "198X"), (D, "1991")) == "BEFORE"
    assert rule((D, "1985"), (D, "198X")) == "IS_INCLUDED"
    assert rule((D, "19XX"), (D, "1985")) == "INCLUDES"
    assert rule((D, "19XX"), (D, "2001")) == "BEFORE"


def test_eras():
    assert rule((D, "PAST_REF"), (D, "FUTURE_REF")) == "BEFORE"
    assert rule((D, "FUTURE_REF"), (D, "PAST_REF")) == "AFTER"
    # PAST_REF vs a date before DCT -> INCLUDES (the ref date is inside
    # "the past"), vs a date at/after DCT -> BEFORE
    assert rule((D, "PAST_REF"), (D, "1989-01-01")) == "INCLUDES"
    assert rule((D, "PAST_REF"), (D, "1990-01-01")) == "BEFORE"
    assert rule((D, "1990-01-01"), (D, "FUTURE_REF")) == "IS_INCLUDED"
    assert rule((D, "1988-01-01"), (D, "FUTURE_REF")) == "BEFORE"


def test_week_java_calendar_semantics():
    # java.util.Calendar (US locale, minimalDaysInFirstWeek=4):
    # 1989 starts on a Sunday => week 1 = Jan 1-7, Monday of W01 = Jan 2
    assert java_week_monday(1989, 1) == datetime.date(1989, 1, 2)
    # 2013 starts on a Tuesday; Sunday-started week containing Jan 1 has
    # 5 in-year days => week 1 starts Dec 30, Monday of W11 = Mar 11
    assert java_week_monday(2013, 11) == datetime.date(2013, 3, 11)


def test_week_vs_week_and_date():
    assert rule((D, "1989-W10"), (D, "1989-W11")) == "BEFORE"
    assert rule((D, "1989-W11"), (D, "1989-W11"),
                identity=True) == "IDENTITY"
    assert rule((D, "1988-W50"), (D, "1989-W02")) == "BEFORE"
    # week includes a date inside it
    mon = java_week_monday(1989, 11)
    inside = "%04d-%02d-%02d" % (mon.year, mon.month, mon.day + 2)
    assert rule((D, "1989-W11"), (D, inside)) == "INCLUDES"
    assert rule((D, inside), (D, "1989-W11")) == "IS_INCLUDED"
    assert rule((D, "1989-W11"), (D, "1989-01-01")) == "AFTER"
    assert rule((D, "1989-W11"), (D, "1989-12-01")) == "BEFORE"


def test_times():
    assert rule((T, "1989-10-26T09:30"), (T, "1989-10-26T10:00")) == "BEFORE"
    assert rule((T, "1989-10-26T10:00"), (T, "1989-10-26T10:00"),
                identity=True) == "IDENTITY"
    assert rule((T, "1989-10-26T09:30"), (T, "1989-10-27T01:00")) == "BEFORE"
    # part-of-day ordering MO < AF < EV < NI
    assert rule((T, "1989-10-26TMO"), (T, "1989-10-26TEV")) == "BEFORE"
    assert rule((T, "1989-10-26TNI"), (T, "1989-10-26TAF")) == "AFTER"
    # part-of-day range vs hour
    assert rule((T, "1989-10-26TMO"), (T, "1989-10-26T09:00")) == "INCLUDES"


def test_date_vs_time():
    assert rule((D, "1989-10-26"), (T, "1989-10-26T09:30")) == "INCLUDES"
    assert rule((T, "1989-10-26T09:30"), (D, "1989-10-26")) == "IS_INCLUDED"


def test_dct_time_stripping():
    # DCT values are stripped to the date part and typed DATE
    assert timex_timex_rule("tmx0", "TIME", "1989-10-26T12:00", True,
                            "tmxB", "DATE", "1989-10-25", False,
                            "1989-10-26T12:00") == "AFTER"


def test_durations_and_unknowns_stay_O():
    assert rule(("DURATION", "P3D"), (D, "1989-10-26")) == "O"
    assert rule((D, "1989-SU"), (D, "1989-10-26")) == "O"


def test_grid_symmetry_on_samples():
    vals = [(D, "1989-10-26"), (D, "1989-10"), (D, "1989-W11"),
            (D, "1989-Q2"), (D, "198X"), (D, "PAST_REF"),
            (T, "1989-10-26T09:30"), (D, "1990")]
    for a in vals:
        for b in vals:
            r1 = rule(a, b)
            r2 = rule(b, a)
            if r1 != "O" and r2 != "O":
                assert r2 == inverse_tlink(r1), (a, b, r1, r2)


def test_date_components():
    d = date_components("1989-10-26")
    assert (d.year, d.month, d.day) == (1989, 10, 26)
    assert date_components("198X").decade == 198
    assert date_components("19XX").century == 19
    assert date_components("PAST_REF").era == "PAST_REF"
    assert date_components("1989-Q3").month_arr == (7, 8, 9)


def test_week_dates_are_seven_consecutive():
    dd = week_dates(2013, 11)
    assert len(dd) == 7
    d0 = datetime.date(*dd[0])
    for i, t in enumerate(dd):
        assert datetime.date(*t) == d0 + datetime.timedelta(days=i)
