"""Property-based tests (hypothesis) for the DDL parser: any generated
well-formed statement round-trips; malformed definitions never parse."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from pyspark.sql import types as T

from wasaffi_spark.ddl import (
    CreateFunctionStmt,
    parse_function_ddl,
    parse_type,
    split_definition,
)
from wasaffi_spark.errors import FunctionDefinitionError

SIMPLE_TYPES = [
    "DOUBLE", "FLOAT", "BIGINT", "INT", "SMALLINT", "TINYINT",
    "VARCHAR", "STRING", "BOOLEAN", "DATE", "TIMESTAMP", "BINARY",
]

type_name = st.one_of(
    st.sampled_from(SIMPLE_TYPES),
    st.builds(lambda p, s: f"DECIMAL({p},{s})", st.integers(1, 38), st.integers(0, 10)),
    st.builds(lambda t: f"ARRAY<{t}>", st.sampled_from(SIMPLE_TYPES)),
    st.builds(
        lambda k, v: f"MAP<{k}, {v}>",
        st.sampled_from(SIMPLE_TYPES),
        st.sampled_from(SIMPLE_TYPES),
    ),
)

ident = st.from_regex(r"[A-Za-z_][A-Za-z0-9_]{0,20}", fullmatch=True).filter(
    lambda s: s.upper() not in {"IF", "EXISTS", "FUNCTION", "RETURNS", "AS", "LANGUAGE"}
)
mod_part = st.from_regex(r"[A-Za-z0-9_./-]{1,30}", fullmatch=True).filter(
    lambda s: "!" not in s
)


@settings(max_examples=200, deadline=None)
@given(
    name=ident,
    args=st.lists(type_name, max_size=5),
    ret=type_name,
    lang=st.one_of(st.none(), ident),
    module=mod_part,
    method=ident,
    replace=st.booleans(),
)
def test_create_function_roundtrip(name, args, ret, lang, module, method, replace):
    ddl = (
        f"CREATE {'OR REPLACE ' if replace else ''}FUNCTION {name}"
        f"({', '.join(args)}) RETURNS {ret} "
        f"{f'LANGUAGE {lang} ' if lang else ''}"
        f"AS '{module}!{method}'"
    )
    stmt = parse_function_ddl(ddl)
    assert isinstance(stmt, CreateFunctionStmt)
    assert stmt.name == name.lower()
    assert stmt.or_replace == replace
    assert len(stmt.arg_types) == len(args)
    assert stmt.arg_types == tuple(parse_type(a) for a in args)
    assert stmt.return_type == parse_type(ret)
    assert (stmt.language or None) == (lang.lower() if lang else None)
    assert split_definition(stmt.definition) == (module, method)


@settings(max_examples=100, deadline=None)
@given(s=st.text(max_size=40))
def test_split_definition_never_crashes_weirdly(s):
    """Any input either splits into two non-empty parts or raises the
    typed error — never an unhandled exception or empty part."""
    try:
        module, method = split_definition(s)
        assert module and method
        # partition on the FIRST '!': parts always reconstruct the input
        assert f"{module}!{method}" == s
        assert "!" not in module
    except FunctionDefinitionError:
        pass


@settings(max_examples=100, deadline=None)
@given(t=type_name)
def test_parse_type_total_on_grammar(t):
    dt = parse_type(t)
    assert isinstance(dt, T.DataType)
