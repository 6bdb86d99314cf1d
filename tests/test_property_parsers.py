"""Property-based round-trips for the parser layer.

CSV strict mode is checked against Python's stdlib ``csv`` module
(itself RFC-4180): any field set the writer emits, the parser must
recover exactly — including embedded delimiters, doubled quotes and
newlines inside quoted fields.
"""

import csv
import io

import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from opentelemetry_collector_contrib_ray.stages.parsers import CsvParser

field = st.text(
    alphabet=st.characters(
        codec="utf-8", exclude_characters="\r\x00",
        max_codepoint=0x2FF,
    ),
    max_size=12,
)


@settings(max_examples=150, deadline=None)
@given(rows=st.lists(st.tuples(field, field, field), min_size=1, max_size=8))
def test_csv_strict_matches_stdlib(rows):
    lines = []
    for r in rows:
        buf = io.StringIO()
        csv.writer(buf, lineterminator="").writerow(r)
        lines.append(buf.getvalue())
    t = pa.table({"text": pa.array(lines, type=pa.string())})
    out = CsvParser(header=["a", "b", "c"])(t)
    for j, name in enumerate(["a", "b", "c"]):
        got = out[f"attributes.{name}"].to_pylist()
        want = [r[j] for r in rows]
        assert got == want, (lines, name, got, want)


@settings(max_examples=80, deadline=None)
@given(rows=st.lists(st.tuples(field, field), min_size=1, max_size=6),
       delim=st.sampled_from([",", ";", "\t", "|"]))
def test_csv_strict_alt_delimiters(rows, delim):
    lines = []
    for r in rows:
        buf = io.StringIO()
        csv.writer(buf, delimiter=delim, lineterminator="").writerow(r)
        lines.append(buf.getvalue())
    t = pa.table({"text": pa.array(lines, type=pa.string())})
    out = CsvParser(header=["a", "b"], delimiter=delim)(t)
    for j, name in enumerate(["a", "b"]):
        assert out[f"attributes.{name}"].to_pylist() == [r[j] for r in rows]
