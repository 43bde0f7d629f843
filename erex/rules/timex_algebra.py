"""Timex-timex value algebra (rule sieve R1 + scalar fns X1/X2).

Re-derives /root/reference/src/model/rule/TimexTimexRelationRule.java:16-510
as pure functions over TIMEX3 value strings: ISO-ish date decomposition
(year/month/day, ``yyyy-Www`` weeks, ``Qn`` quarters, ``198X`` decades,
``19XX`` centuries, PAST/PRESENT/FUTURE_REF eras), time-of-day comparison
(H:M:S and MO<AF<EV<NI part-of-day ranges), and the comparison lattice.

Deliberate reference quirks kept:
- DCT values are time-stripped and treated as DATE (lines 22-29); the rule
  never fires for a pair of identical ids;
- week expansion mirrors java.util.Calendar with a US locale:
  Sunday-started weeks, minimalDaysInFirstWeek=4, then DAY_OF_WEEK=MONDAY
  (lines 116-158) — NOT plain ISO-8601;
- with identity_rel=False, IDENTITY downgrades to SIMULTANEOUS (84-88);
  the production driver always passes False (TempRelPro.java:71-72).
"""

from __future__ import annotations

import datetime as _dt
import re

_ERAS = ("PAST_REF", "PRESENT_REF", "FUTURE_REF")
_DIGITS = re.compile(r"\d+$")
_PARTDAY_RANGE = {
    "MO": tuple(range(1, 12)),
    "AF": (13, 14, 15, 16),
    "EV": (17, 18, 19, 20),
    "NI": (21, 22, 23, 24, 0),
}
_PARTDAY_ORDER = ("MO", "AF", "EV", "NI")
_QUARTER = {"1": (1, 2, 3), "2": (4, 5, 6), "3": (7, 8, 9), "4": (10, 11, 12)}


class DateC:
    """Decomposed date (inner class Date, TimexTimexRelationRule.java:528)."""
    __slots__ = ("century", "decade", "year", "month", "day", "month_arr", "era")

    def __init__(self):
        self.century = 0
        self.decade = 0
        self.year = 0
        self.month = 0
        self.day = 0
        self.month_arr: tuple = ()
        self.era = ""

    def ymd(self):
        return (self.year, self.month, self.day)


class TimeC:
    __slots__ = ("hour", "minute", "second", "part_day", "range")

    def __init__(self):
        self.hour = 0
        self.minute = 0
        self.second = 0
        self.part_day = ""
        self.range: tuple = ()


def date_components(value: str) -> DateC:
    """TimexTimexRelationRule.java:416-465."""
    d = DateC()
    cols = value.split("-")
    if len(cols) == 1:
        c = cols[0]
        if _DIGITS.match(c):
            d.year = int(c)
        elif len(c) == 4 and "X" in c:
            y = c.replace("X", "")
            if len(y) == 3:
                d.decade = int(y)
            elif len(y) == 2:
                d.century = int(y)
        else:
            d.era = c
    elif len(cols) == 2:
        if _DIGITS.match(cols[0]) and _DIGITS.match(cols[1]):
            d.year = int(cols[0])
            d.month = int(cols[1])
        elif cols[1].startswith("Q") and _DIGITS.match(cols[0]):
            d.year = int(cols[0])
            d.month_arr = _QUARTER.get(cols[1][-1:], ())
    elif (len(cols) == 3 and _DIGITS.match(cols[0])
          and _DIGITS.match(cols[1]) and _DIGITS.match(cols[2])):
        d.year = int(cols[0])
        d.month = int(cols[1])
        d.day = int(cols[2])
    return d


def time_components(value: str) -> TimeC:
    """TimexTimexRelationRule.java:467-510."""
    t = TimeC()
    cols = value.split(":")
    if len(cols) == 1:
        if _DIGITS.match(cols[0]):
            t.hour = int(cols[0])
        elif cols[0] in _PARTDAY_RANGE:
            t.part_day = cols[0]
            t.range = _PARTDAY_RANGE[cols[0]]
    elif len(cols) == 2 and _DIGITS.match(cols[0]) and _DIGITS.match(cols[1]):
        t.hour, t.minute = int(cols[0]), int(cols[1])
    elif (len(cols) == 3 and _DIGITS.match(cols[0])
          and _DIGITS.match(cols[1]) and _DIGITS.match(cols[2])):
        t.hour, t.minute, t.second = int(cols[0]), int(cols[1]), int(cols[2])
    return t


def java_week_monday(year: int, week: int) -> _dt.date:
    """Date of DAY_OF_WEEK=MONDAY in WEEK_OF_YEAR=week, replicating
    java.util.Calendar (US locale: Sunday week start,
    minimalDaysInFirstWeek=4). X2 of SURVEY.md §2.10."""
    jan1 = _dt.date(year, 1, 1)
    # Java DAY_OF_WEEK: SUNDAY=1..SATURDAY=7; Python weekday(): Mon=0..Sun=6
    dow = (jan1.weekday() + 1) % 7 + 1          # 1=Sunday .. 7=Saturday
    week1_sunday = jan1 - _dt.timedelta(days=dow - 1)
    if 8 - dow < 4:                              # Jan-1 week too short -> week 1 is next week
        week1_sunday += _dt.timedelta(days=7)
    return week1_sunday + _dt.timedelta(days=(week - 1) * 7 + 1)


def week_dates(year: int, week: int) -> list:
    """The 7 (y, m, d) tuples Monday..Sunday of the Java-semantics week."""
    mon = java_week_monday(year, week)
    return [((mon + _dt.timedelta(days=i)).year,
             (mon + _dt.timedelta(days=i)).month,
             (mon + _dt.timedelta(days=i)).day) for i in range(7)]


def _date_relation(d1: DateC, d2: DateC) -> str:
    """TimexTimexRelationRule.java:248-360 comparison lattice."""
    if d1.year == 0 and d2.year == 0:
        return "O"
    if d1.year == 0 and d2.year != 0:
        if d1.decade != 0:
            yy = int(str(d2.year)[:3])
            if d1.decade < yy:
                return "BEFORE"
            if d1.decade > yy:
                return "AFTER"
            return "INCLUDES"
        if d1.century != 0:
            yy = int(str(d2.year)[:2])
            if d1.century < yy:
                return "BEFORE"
            if d1.century > yy:
                return "AFTER"
            return "INCLUDES"
        return "O"
    if d1.year != 0 and d2.year == 0:
        if d2.decade != 0:
            yy = int(str(d1.year)[:3])
            if yy < d2.decade:
                return "BEFORE"
            if yy > d2.decade:
                return "AFTER"
            return "IS_INCLUDED"
        if d2.century != 0:
            yy = int(str(d1.year)[:2])
            if yy < d2.century:
                return "BEFORE"
            if yy > d2.century:
                return "AFTER"
            return "IS_INCLUDED"
        return "O"
    if d1.year < d2.year:
        return "BEFORE"
    if d1.year > d2.year:
        return "AFTER"
    # same year
    if d1.month_arr and not d2.month_arr:
        if d2.month == 0:
            return "IS_INCLUDED"
        if d2.month in d1.month_arr:
            return "INCLUDES"
        if d2.month < d1.month_arr[0]:
            return "AFTER"
        if d2.month > d1.month_arr[-1]:
            return "BEFORE"
        return "O"
    if not d1.month_arr and d2.month_arr:
        if d1.month == 0:
            return "INCLUDES"
        if d1.month in d2.month_arr:
            return "IS_INCLUDED"
        if d1.month < d2.month_arr[0]:
            return "BEFORE"
        if d1.month > d2.month_arr[-1]:
            return "AFTER"
        return "O"
    if d1.month_arr and d2.month_arr:
        if d1.month_arr[0] == d2.month_arr[0]:
            return "IDENTITY"
        if d1.month_arr[-1] < d2.month_arr[0]:
            return "BEFORE"
        if d2.month_arr[-1] < d1.month_arr[0]:
            return "AFTER"
        return "O"
    if d1.month < d2.month:
        return "BEFORE"
    if d1.month > d2.month:
        return "AFTER"
    if d1.day != 0 and d2.day != 0:
        if d1.day < d2.day:
            return "BEFORE"
        if d1.day > d2.day:
            return "AFTER"
        return "IDENTITY"
    if d1.day == 0 and d2.day != 0:
        return "INCLUDES"
    if d1.day != 0 and d2.day == 0:
        return "IS_INCLUDED"
    return "IDENTITY"


def _time_relation(t1: TimeC, t2: TimeC) -> str:
    """TimexTimexRelationRule.java:362-414."""
    if t1.range and not t2.range:
        if t2.hour in t1.range:
            return "INCLUDES"
        if t2.hour < t1.range[0]:
            return "AFTER"
        if t2.hour > t1.range[-1]:
            return "BEFORE"
        return "O"
    if not t1.range and t2.range:
        if t1.hour in t2.range:
            return "IS_INCLUDED"
        if t1.hour < t2.range[0]:
            return "BEFORE"
        if t1.hour > t2.range[-1]:
            return "AFTER"
        return "O"
    if t1.range and t2.range:
        if t1.part_day in _PARTDAY_ORDER and t2.part_day in _PARTDAY_ORDER:
            i1 = _PARTDAY_ORDER.index(t1.part_day)
            i2 = _PARTDAY_ORDER.index(t2.part_day)
            if i1 < i2:
                return "BEFORE"
            if i1 > i2:
                return "AFTER"
            return "IDENTITY"
        return "O"
    for a, b in ((t1.hour, t2.hour), (t1.minute, t2.minute),
                 (t1.second, t2.second)):
        if a < b:
            return "BEFORE"
        if a > b:
            return "AFTER"
    return "IDENTITY"


def _tmx_date_relation(date1: str, date2: str, dct_value: str) -> str:
    """TimexTimexRelationRule.java:176-246 (era handling + date compare)."""
    if date1 not in _ERAS and "T" in date1:
        date1 = date1.split("T")[0]
    if date2 not in _ERAS and "T" in date2:
        date2 = date2.split("T")[0]
    d1 = date_components(date1)
    d2 = date_components(date2)
    dct = date_components(dct_value.split("T")[0])

    if d1.era in _ERAS and d2.era in _ERAS:
        i1, i2 = _ERAS.index(d1.era), _ERAS.index(d2.era)
        if i1 < i2:
            return "BEFORE"
        if i1 > i2:
            return "AFTER"
        return "IDENTITY"
    if d1.era in _ERAS and d2.era == "":
        rel2 = _date_relation(d2, dct)
        if d1.era == "PAST_REF":
            return "INCLUDES" if rel2 == "BEFORE" else "BEFORE"
        if d1.era == "PRESENT_REF":
            return "INCLUDES" if rel2 == "IDENTITY" else rel2
        return "INCLUDES" if rel2 == "AFTER" else "AFTER"   # FUTURE_REF
    if d1.era == "" and d2.era in _ERAS:
        rel1 = _date_relation(d1, dct)
        if d2.era == "PAST_REF":
            return "IS_INCLUDED" if rel1 == "BEFORE" else "AFTER"
        if d2.era == "PRESENT_REF":
            return "IS_INCLUDED" if rel1 == "IDENTITY" else rel1
        return "IS_INCLUDED" if rel1 == "AFTER" else "BEFORE"  # FUTURE_REF
    return _date_relation(d1, d2)


def _tmx_week_date_relation(date1: str, date2: str) -> str:
    """TimexTimexRelationRule.java:91-174."""
    if "T" in date1:
        date1 = date1.split("T")[0]
    if "T" in date2:
        date2 = date2.split("T")[0]
    w1, w2 = "W" in date1, "W" in date2
    try:
        if w1 and w2 and "X" not in date1 and "X" not in date2:
            y1, n1 = (int(x) for x in date1.split("-W"))
            y2, n2 = (int(x) for x in date2.split("-W"))
            if (y1, n1) < (y2, n2):
                return "BEFORE"
            if (y1, n1) > (y2, n2):
                return "AFTER"
            return "IDENTITY"
        if w1 and not w2 and "X" not in date1:
            y1, n1 = (int(x) for x in date1.split("-W"))
            dd1 = week_dates(y1, n1)
            d2 = date_components(date2).ymd()
            if d2 in dd1:
                return "INCLUDES"
            dc2 = date_components(date2)
            last = date_components("%04d-%02d-%02d" % dd1[6])
            first = date_components("%04d-%02d-%02d" % dd1[0])
            if _date_relation(last, dc2) == "BEFORE":
                return "BEFORE"
            if _date_relation(first, dc2) == "AFTER":
                return "AFTER"
            return "O"
        if not w1 and w2 and "X" not in date2:
            y2, n2 = (int(x) for x in date2.split("-W"))
            dd2 = week_dates(y2, n2)
            d1 = date_components(date1).ymd()
            if d1 in dd2:
                return "IS_INCLUDED"
            dc1 = date_components(date1)
            first = date_components("%04d-%02d-%02d" % dd2[0])
            last = date_components("%04d-%02d-%02d" % dd2[6])
            if _date_relation(dc1, first) == "BEFORE":
                return "BEFORE"
            if _date_relation(dc1, last) == "AFTER":
                return "AFTER"
            return "O"
    except (ValueError, IndexError):
        return "O"
    return "O"


def _strip_dct(value: str) -> str:
    return value.split("T")[0] if "T" in value else value


def timex_timex_rule(t1_id: str, t1_type: str, t1_value: str, t1_is_dct: bool,
                     t2_id: str, t2_type: str, t2_value: str, t2_is_dct: bool,
                     dct_value: str, identity_rel: bool = False) -> str:
    """Rule R1: relation of (t1, t2) or 'O'.

    Mirrors the TimexTimexRelationRule constructor (lines 16-89): DCTs are
    time-stripped and forced to DATE; dispatch on (type1, type2) in
    DATE/TIME; week routing when either value has 'W' (but not 'WI' or
    'P'); optional IDENTITY->SIMULTANEOUS downgrade."""
    if t1_is_dct:
        t1_value = _strip_dct(t1_value)
        t1_type = "DATE"
    if t2_is_dct:
        t2_value = _strip_dct(t2_value)
        t2_type = "DATE"

    rel = "O"
    if t1_id != t2_id:
        if t1_type == "DATE" and t2_type == "TIME":
            if t1_value == t2_value:
                rel = "IDENTITY"
            elif t1_value in t2_value:
                rel = "INCLUDES"
            else:
                rel = _tmx_date_relation(t1_value, t2_value, dct_value)
        elif t1_type == "TIME" and t2_type == "DATE":
            if t1_value == t2_value:
                rel = "IDENTITY"
            elif t2_value in t1_value:
                rel = "IS_INCLUDED"
            else:
                rel = _tmx_date_relation(t1_value, t2_value, dct_value)
        elif t1_type == "DATE" and t2_type == "DATE":
            if t1_value == t2_value:
                rel = "IDENTITY"
            elif t1_value in t2_value:
                rel = "INCLUDES"
            elif t2_value in t1_value:
                rel = "IS_INCLUDED"
            else:
                if (("W" in t1_value or "W" in t2_value)
                        and "WI" not in t1_value and "WI" not in t2_value
                        and "P" not in t1_value and "P" not in t2_value):
                    rel = _tmx_week_date_relation(t1_value, t2_value)
                else:
                    rel = _tmx_date_relation(t1_value, t2_value, dct_value)
        elif t1_type == "TIME" and t2_type == "TIME":
            dt1 = t1_value.split("T") if len(t1_value.split("T")) > 1 \
                else [t1_value, ""]
            dt2 = t2_value.split("T") if len(t2_value.split("T")) > 1 \
                else [t2_value, ""]
            if dt1[0] == dt2[0]:
                if dt1[1] != "" and dt2[1] != "":
                    rel = _time_relation(time_components(dt1[1]),
                                         time_components(dt2[1]))
            else:
                rel = _tmx_date_relation(dt1[0], dt2[0], dct_value)

    if rel is None:
        rel = "O"
    if not identity_rel and rel == "IDENTITY":
        rel = "SIMULTANEOUS"
    return rel
