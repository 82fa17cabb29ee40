"""Property-based parser tests (hypothesis) — pure Python, no Spark.

The grammar is cloned from the reference (``src/cli-grammer/AHGHEE.g4``);
these check that arbitrary well-formed command text parses to the IR that
regenerating the text implies, and that the literal policy
(``ContextExtensions.cs:194-213`` simplified) round-trips values."""

from __future__ import annotations

import json

from hypothesis import given, settings, strategies as st

from ekati_spark.graph import ir
from ekati_spark.graph.parser import parse

# identifiers/strings that survive double-quoting in the language
_str_values = st.text(
    alphabet=st.characters(
        codec="ascii", exclude_characters='"\\', exclude_categories=("Cc",)
    ),
    max_size=25,
)
_iris = st.text(
    alphabet="abcdefghijklmnopqrstuvwxyz0123456789:/._-", min_size=1, max_size=20
)
_scalars = st.one_of(
    st.integers(min_value=-(2**62), max_value=2**62),
    st.floats(allow_nan=False, allow_infinity=False, width=32),
    st.booleans(),
    _str_values,
)


def _fmt(v) -> str:
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, str):
        return json.dumps(v)
    if isinstance(v, float):
        return repr(v)
    return str(v)


@settings(max_examples=200, deadline=None)
@given(iri=_iris, key=_str_values, value=_scalars)
def test_put_scalar_roundtrip(iri, key, value):
    cmd = parse(f'put "{iri}" {{{json.dumps(key)}: {_fmt(value)}}}')
    assert isinstance(cmd, ir.PutCommand)
    (node,) = cmd.nodes
    assert node.id == ir.NodeRef(iri)
    (pair,) = node.pairs
    assert pair.kind == ir.PairKind.KVP
    assert pair.key == key
    if isinstance(value, float):
        assert float(pair.value) == value
    else:
        assert pair.value == value and type(pair.value) is type(value)


@settings(max_examples=100, deadline=None)
@given(seeds=st.lists(_iris, min_size=1, max_size=5), skip=st.integers(0, 99),
       take=st.integers(0, 99))
def test_get_skip_take_roundtrip(seeds, skip, take):
    text = "get " + ", ".join(f'"{s}"' for s in seeds)
    text += f" |> skip {skip} |> take {take}"
    q = parse(text)
    assert q.seeds == tuple(ir.NodeRef(s) for s in seeds)
    assert q.steps == (ir.SkipStep(skip), ir.LimitStep(take))


@settings(max_examples=100, deadline=None)
@given(label=_iris, frm=st.integers(0, 9), to=st.integers(0, 9))
def test_follow_range_roundtrip(label, frm, to):
    q = parse(f'get "x" |> follow "{label}" {frm}..{to}')
    assert q.steps[0] == ir.FollowStep(ir.Edge(label, frm, to))
    q2 = parse(f'get "x" |> follow "{label}" {to}')
    assert q2.steps[0] == ir.FollowStep(ir.Edge(label, 1, to))


@settings(max_examples=100, deadline=None)
@given(key=_iris, n=st.integers(-(2**31), 2**31), op=st.sampled_from(
    ["==", "!=", "<", "<=", ">", ">="]))
def test_filter_ops_roundtrip(key, n, op):
    q = parse(f'get "*" |> filter "{key}" {op} {n}')
    assert q.steps[0] == ir.FilterStep(ir.KeyValueCmp(key, op, n))


@settings(max_examples=50, deadline=None)
@given(depth=st.integers(1, 4), labels=st.lists(_iris, min_size=2, max_size=5))
def test_nested_boolean_follow_parses(depth, labels):
    """Arbitrarily nested &&/|| edge trees parse without error and keep
    every label."""
    expr = f'"{labels[0]}" 1'
    for i, lab in enumerate(labels[1:]):
        op = "&&" if i % 2 == 0 else "||"
        expr = f'({expr} {op} "{lab}" {i + 1})'
    q = parse(f'get "x" |> follow {expr}')

    def collect(spec):
        if isinstance(spec, ir.Edge):
            return [spec.label]
        return collect(spec.left) + collect(spec.right)

    assert collect(q.steps[0].spec) == labels


@settings(max_examples=100, deadline=None)
@given(vals=st.lists(_scalars, max_size=5))
def test_array_values_roundtrip(vals):
    cmd = parse(f'put "a" {{"arr": [{", ".join(_fmt(v) for v in vals)}]}}')
    got = cmd.nodes[0].pairs[0].value
    assert isinstance(got, list) and len(got) == len(vals)
    for g, v in zip(got, vals):
        if isinstance(v, float):
            assert float(g) == v
        else:
            assert g == v
