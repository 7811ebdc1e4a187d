"""SPARQL text front-end: the parser's term/clause mapping, its
rejections, and text-vs-programmatic execution equivalence (the parser
must produce the compiler's own structures, nothing more)."""

from __future__ import annotations

import pytest

from fcrepo3_rdf_extractor_spark.operators.bgp import (
    bgp_aggregate,
    bgp_query,
)
from fcrepo3_rdf_extractor_spark.operators.sparql import (
    SparqlParseError,
    parse_sparql,
    sparql_query,
)

RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"


# --- pure parse tests (no Spark) -------------------------------------------


def test_parse_select_full_clause_set():
    q = parse_sparql(
        """
        PREFIX rel: <info:fedora/rel#>
        PREFIX m: <info:fedora/model#>
        SELECT DISTINCT ?obj ?coll WHERE {
          ?obj rel:member ?coll .
          ?obj m:state m:Active .
          OPTIONAL { ?obj m:owner ?owner }
          FILTER(CONTAINS(?coll, "c:1"))
          FILTER(?obj != "x")
          FILTER NOT EXISTS { ?obj m:label "hidden" }
          MINUS { ?obj m:flag "bad" }
        }
        ORDER BY DESC(?obj) LIMIT 7 OFFSET 3
        """
    )
    assert q.verb == "select" and q.distinct
    assert q.select == ["obj", "coll"]
    assert q.patterns == [
        ("?obj", "<info:fedora/rel#member>", "?coll"),
        ("?obj", "<info:fedora/model#state>", "<info:fedora/model#Active>"),
    ]
    assert q.optional_patterns == [
        [("?obj", "<info:fedora/model#owner>", "?owner")]
    ]
    assert q.filters == [("?coll", "contains", "c:1"), ("?obj", "!=", "x")]
    assert q.not_exists == [
        [("?obj", "<info:fedora/model#label>", "<hidden>")],
        [("?obj", "<info:fedora/model#flag>", "<bad>")],
    ]
    assert q.order_by == [("obj", "desc")]
    assert (q.limit, q.offset) == (7, 3)


def test_parse_terms_paths_and_a():
    q = parse_sparql(
        "SELECT * WHERE { ?x <knows>+ ?y . ?z ^<knows> ?y . "
        "?a (<p>|<q>)* ?b . ?s a ?t . ?u <p>? ?v }"
    )
    # inverse keeps the literal-match brackets INSIDE the ^ marker so an
    # IRI ending in +/*/? can never be re-read as a path by scan()
    assert [p[1] for p in q.patterns] == [
        "knows+", "^<knows>", "p|q*", f"<{RDF_TYPE}>", "p?"
    ]


def test_parse_predicate_lists_and_numbers():
    q = parse_sparql('SELECT * WHERE { ?x <p> ?y ; <q> 5 ; <r> "s" . }')
    assert q.patterns == [
        ("?x", "<p>", "?y"), ("?x", "<q>", "<5>"), ("?x", "<r>", "<s>")
    ]


def test_parse_graph_and_values_forms():
    q = parse_sparql('SELECT * WHERE { GRAPH ?g { ?x <p> ?y } }')
    assert q.graph == "?g"
    q = parse_sparql('SELECT * WHERE { GRAPH <g1> { ?x <p> ?y } }')
    assert q.graph == "g1"
    q = parse_sparql(
        'SELECT * WHERE { ?x <p> ?y . VALUES ?x { "a" <b> } . '
        'VALUES (?x ?y) { ("c" "d") ("e" UNDEF) } }'
    )
    assert q.values == [
        {"?x": "a"}, {"?x": "b"}, {"?x": "c", "?y": "d"}, {"?x": "e"}
    ]


def test_parse_aggregates_and_having():
    q = parse_sparql(
        'SELECT ?c (COUNT(DISTINCT ?x) AS ?n) '
        '(GROUP_CONCAT(?x; SEPARATOR = "|") AS ?xs) '
        'WHERE { ?x <member> ?c } GROUP BY ?c HAVING(?n >= 2)'
    )
    assert q.aggs == [("count_distinct", "?x", "n"), ("group_concat:|", "?x", "xs")]
    assert q.group_by == ["c"] and q.having == [("n", ">=", 2.0)]
    # implicit single group when an aggregate appears without GROUP BY
    q = parse_sparql('SELECT (COUNT(*) AS ?n) WHERE { ?x <p> ?y }')
    assert q.group_by == [] and q.aggs == [("count", "*", "n")]


def test_parse_rejections():
    cases = [
        ("SELECT ?x WHERE { ?x ex:p ?y }", "undeclared prefix"),
        ("SELECT ?x WHERE { ?x <p> ?y } GROUP BY ?x", "GROUP BY without"),
        ("SELECT ?x WHERE { ?x (<p>|<q>) ?y }", "bare alternation"),
        ("SELECT (AVG(DISTINCT ?x) AS ?a) WHERE { ?s <p> ?x }",
         "DISTINCT inside"),
        ("SELECT ?x WHERE { ?x <p> ?y . GRAPH <g> { ?x <q> ?z } }",
         "wrapper of the whole"),
        ("SELECT ?y (COUNT(*) AS ?n) WHERE { ?x <p> ?y } "
         "GROUP BY ?y ORDER BY ?x", "not a group key"),
        ("ASK { ?x <p> ?y } trailing", "trailing input"),
        ("FOO { ?x <p> ?y }", "expected SELECT"),
    ]
    for text, msg in cases:
        with pytest.raises(SparqlParseError, match=msg):
            parse_sparql(text)


# --- execution equivalence (text plan == programmatic plan) -----------------


@pytest.fixture(scope="module")
def quads(spark):
    rows = [
        ("a", "knows", "b", "g1"),
        ("b", "type", "Person", "g1"),
        ("b", "type", "Robot", "g2"),
        ("c", "knows", "b", "g2"),
        ("b", "knows", "c", "g2"),
        ("a", "type", "Person", "g2"),
    ]
    return spark.createDataFrame(
        rows, "subj string, pred string, obj_value string, graph string"
    )


def test_text_equals_programmatic_select(quads):
    """The parsed query must produce the same plan as the programmatic
    call — compare both the results and the optimized-plan strings."""
    text = sparql_query(
        quads,
        'SELECT ?x ?t ?g WHERE { GRAPH ?g { ?x <knows> ?y . '
        '?y <type> ?t } }',
    )
    prog = bgp_query(
        quads,
        [("?x", "<knows>", "?y"), ("?y", "<type>", "?t")],
        select=["x", "t", "g"],
        graph="?g",
    )
    assert sorted(map(tuple, text.collect())) == sorted(
        map(tuple, prog.collect())
    )
    import re

    def norm(df):
        plan = df._jdf.queryExecution().optimizedPlan().toString()
        return re.sub(r"#\d+", "#", plan)  # expression ids differ per plan

    assert norm(text) == norm(prog)


def test_text_verbs_ask_construct_describe(quads):
    assert sparql_query(quads, 'ASK { ?x <type> "Robot" }').collect()[0].matched
    assert not sparql_query(quads, 'ASK { ?x <type> "Alien" }').collect()[0].matched

    con = sorted(
        (r.subj, r.pred, r.obj_value)
        for r in sparql_query(
            quads, 'CONSTRUCT { ?y <knownBy> ?x } WHERE { ?x <knows> ?y }'
        ).collect()
    )
    assert con == [("b", "knownBy", "a"), ("b", "knownBy", "c"),
                   ("c", "knownBy", "b")]

    dsc = sorted(
        (r.pred, r.obj_value)
        for r in sparql_query(
            quads, 'DESCRIBE ?y WHERE { ?x <knows> ?y . FILTER(?x = "a") }'
        ).collect()
    )
    assert dsc == [("knows", "c"), ("type", "Person"), ("type", "Robot")]


def test_text_aggregate_union_values(quads):
    agg = sparql_query(
        quads,
        'SELECT ?y (COUNT(*) AS ?n) WHERE { ?x <knows> ?y } '
        'GROUP BY ?y HAVING(?n >= 2)',
    ).collect()
    prog = bgp_aggregate(
        quads, [("?x", "<knows>", "?y")], group_by=["y"],
        aggs=[("count", "*", "n")], having=[("n", ">=", 2.0)],
    ).collect()
    assert sorted(map(tuple, agg)) == sorted(map(tuple, prog)) == [("b", 2)]

    uni = sorted(
        (r.x, str(r.c), str(r.o))
        for r in sparql_query(
            quads,
            'SELECT ?x ?c ?o WHERE { { ?x <knows> ?c } UNION '
            '{ ?x <type> ?o } }',
        ).collect()
    )
    assert ("a", "b", "None") in uni and ("a", "None", "Person") in uni

    vals = sparql_query(
        quads,
        'SELECT * WHERE { ?x <knows> ?y . VALUES ?x { "a" "zz" } }',
    ).collect()
    assert [(r.x, r.y) for r in vals] == [("a", "b")]


def test_text_numeric_filter_and_paths(spark):
    t = spark.createDataFrame(
        [("n:1", "v", "10"), ("n:2", "v", "5"), ("n:3", "v", "oops"),
         ("n:1", "p", "n:2"), ("n:2", "p", "n:3")],
        "subj string, pred string, obj_value string",
    )
    # unquoted number -> numeric semantics ('10' > 6; 'oops' drops)
    got = sorted(
        r.x for r in sparql_query(
            t, 'SELECT ?x WHERE { ?x <v> ?n . FILTER(?n > 6) }'
        ).collect()
    )
    assert got == ["n:1"]
    # quoted number -> lexicographic ('10' < '6' as strings)
    got = sorted(
        r.x for r in sparql_query(
            t, 'SELECT ?x WHERE { ?x <v> ?n . FILTER(?n > "6") }'
        ).collect()
    )
    assert got == ["n:3"]
    closure = sorted(
        (r.x, r.y)
        for r in sparql_query(t, 'SELECT ?x ?y WHERE { ?x <p>+ ?y }').collect()
    )
    assert closure == [("n:1", "n:2"), ("n:1", "n:3"), ("n:2", "n:3")]


def test_parse_limit_offset_order_and_dups():
    # SPARQL 1.1 LimitOffsetClauses: either order is legal
    q = parse_sparql('SELECT ?x WHERE { ?x <p> ?y } OFFSET 2 LIMIT 5')
    assert (q.limit, q.offset) == (5, 2)
    q = parse_sparql('SELECT ?x WHERE { ?x <p> ?y } LIMIT 5 OFFSET 2')
    assert (q.limit, q.offset) == (5, 2)
    with pytest.raises(SparqlParseError, match="duplicate LIMIT"):
        parse_sparql('SELECT ?x WHERE { ?x <p> ?y } LIMIT 1 LIMIT 2')
    with pytest.raises(SparqlParseError, match="duplicate OFFSET"):
        parse_sparql('SELECT ?x WHERE { ?x <p> ?y } OFFSET 1 OFFSET 2')


def test_parse_escape_pairs_single_pass():
    # '\\n' in the query text = escaped backslash + letter n: must decode
    # to backslash+n, NEVER to a newline (the old sequential-replace bug)
    q = parse_sparql('SELECT * WHERE { ?x <p> "a\\\\nb" }')
    assert q.patterns[0][2] == "<a\\nb>" and "\n" not in q.patterns[0][2]
    q = parse_sparql('SELECT * WHERE { ?x <p> "a\\nb" }')
    assert q.patterns[0][2] == "<a\nb>"


def test_parse_prefix_decl_rejects_nonempty_local():
    # 'ex:junk' after PREFIX is a typo, not a declaration
    with pytest.raises(SparqlParseError, match="expected 'pfx:'"):
        parse_sparql('PREFIX ex:junk <http://e/> SELECT ?x WHERE { ?x <p> ?y }')


def test_parse_pname_never_eats_triple_dot():
    # PNAME local part cannot END with '.', so 'ex:q.' is the name ex:q
    # followed by the triple terminator — not a name with a trailing dot
    q = parse_sparql(
        'PREFIX ex: <http://e/> SELECT * WHERE { ?x ex:p ex:q. ?x ex:r ?y }'
    )
    assert q.patterns == [
        ("?x", "<http://e/p>", "<http://e/q>"),
        ("?x", "<http://e/r>", "?y"),
    ]


def test_inverse_path_of_iri_ending_in_path_char(spark):
    # an IRI whose last character is '+' must stay a literal predicate
    # under ^ inversion, never re-read as a one-or-more path
    t = spark.createDataFrame(
        [("a", "knows+", "b"), ("b", "knows", "c")],
        "subj string, pred string, obj_value string",
    )
    got = [r.z for r in sparql_query(
        t, 'SELECT ?z WHERE { ?z ^<knows+> "a" }'
    ).collect()]
    assert got == ["b"]


def test_union_solution_modifiers(quads):
    # ORDER BY / LIMIT / DISTINCT apply to the COMBINED union solutions
    got = [r.x for r in sparql_query(
        quads,
        'SELECT ?x WHERE { { ?x <knows> ?y } UNION { ?x <type> ?o } } '
        'ORDER BY ?x LIMIT 3',
    ).collect()]
    assert got == ["a", "a", "b"]
    got = sorted(r.x for r in sparql_query(
        quads,
        'SELECT DISTINCT ?x WHERE { { ?x <knows> ?y } UNION '
        '{ ?x <type> ?o } }',
    ).collect())
    assert got == ["a", "b", "c"]


def test_describe_constant_forms(quads):
    rows = sorted(
        (r.pred, r.obj_value)
        for r in sparql_query(quads, 'DESCRIBE <a>').collect()
    )
    assert rows == [("knows", "b"), ("type", "Person")]
    # a WHERE clause on a constant DESCRIBE would be silently inert
    with pytest.raises(ValueError, match="takes no WHERE"):
        sparql_query(quads, 'DESCRIBE <a> WHERE { ?x <p> ?y }')


def test_parse_bind_and_seq_paths():
    q = parse_sparql(
        """
        SELECT ?x ?lbl WHERE {
          ?x <p>/<q>+ ?y .
          BIND(CONCAT(STR(?x), "-", STR(?y)) AS ?lbl)
          BIND(1 + 2 * 3 AS ?seven)
        }
        """
    )
    # p/q+ desugars through one fresh intermediate; the second step
    # keeps its own + modifier
    assert q.patterns == [("?x", "<p>", "?_seq0"), ("?_seq0", "q+", "?y")]
    assert q.binds[0] == (
        "?lbl",
        ("concat", [("str", ("var", "?x")), ("const", "-"),
                    ("str", ("var", "?y"))]),
    )
    # standard precedence: 1 + (2 * 3)
    assert q.binds[1] == (
        "?seven",
        ("arith", "+", ("const", 1.0),
         ("arith", "*", ("const", 2.0), ("const", 3.0))),
    )
    # SELECT * hides the synthetic intermediate but keeps bind targets
    q2 = parse_sparql("SELECT * WHERE { ?x <p>/<q> ?y . "
                      'BIND(STR(?x) AS ?s) }')
    assert q2.select == ["x", "y", "s"]


def test_parse_bind_rejections():
    cases = [
        ("SELECT * WHERE { ?x <p> ?y . BIND(STR(?x) AS ?y) }",
         "rebind"),
        ("SELECT (COUNT(*) AS ?n) WHERE { ?x <p> ?y . "
         "BIND(STR(?x) AS ?s) }", "BIND with aggregates"),
        ("ASK { ?x <p> ?y . BIND(STR(?x) AS ?s) }", "SELECT queries only"),
        ("SELECT * WHERE { ?x <p> ?y . BIND(NOW() AS ?t) }",
         "expression supports"),
    ]
    for text, msg in cases:
        with pytest.raises(SparqlParseError, match=msg):
            parse_sparql(text)


def test_text_bind_and_seq_execution(quads):
    """BIND values and sequence-path joins, text vs programmatic."""
    out = sparql_query(
        quads,
        'SELECT ?x ?t ?lbl WHERE { ?x <knows>/<type> ?t . '
        'BIND(CONCAT(STR(?x), ":", STR(?t)) AS ?lbl) }',
    )
    got = sorted(map(tuple, out.collect()))
    prog = bgp_query(
        quads,
        [("?x", "<knows>", "?m"), ("?m", "<type>", "?t")],
        select=["x", "t"],
    )
    want = sorted((x, t, f"{x}:{t}") for x, t in map(tuple, prog.collect()))
    assert got == want
    # arithmetic binds: try_cast(double) semantics, non-numeric -> NULL
    arith = sparql_query(
        quads,
        'SELECT ?six ?bad WHERE { ?x <knows> ?y . '
        "BIND(2 * 3 AS ?six) BIND(?x + 1 AS ?bad) }",
    ).collect()
    assert all(r.six == 6.0 and r.bad is None for r in arith)


def test_parse_and_execute_filter_exists(quads):
    """FILTER EXISTS: group-level positive existence — a LEFT SEMI join
    on the shared variables; solutions never multiply even when the
    group matches multiple ways."""
    q = parse_sparql(
        'SELECT ?x WHERE { ?x <knows> ?y . FILTER EXISTS { ?x <type> ?t } }'
    )
    assert q.exists == [[("?x", "<type>", "?t")]]
    got = sorted(
        r.x
        for r in sparql_query(
            quads,
            'SELECT ?x WHERE { ?x <knows> ?y . '
            "FILTER EXISTS { ?x <type> ?t } }",
        ).collect()
    )
    # a knows b (a typed Person in g2) ✓; b knows c (b typed twice but
    # appears ONCE — semi-join) ✓; c knows b (c has no type) ✗
    assert got == ["a", "b"]
    # NOT EXISTS stays the complement
    neg = sorted(
        r.x
        for r in sparql_query(
            quads,
            'SELECT ?x WHERE { ?x <knows> ?y . '
            "FILTER NOT EXISTS { ?x <type> ?t } }",
        ).collect()
    )
    assert neg == ["c"]


def test_parse_and_execute_negated_property_set(quads):
    """Negated property sets: !p and !(p|q) compile to a NOT-IN filter
    on the pattern scan; inverse members are rejected."""
    q = parse_sparql("SELECT * WHERE { ?x !<knows> ?y }")
    assert q.patterns == [("?x", "!knows", "?y")]
    q = parse_sparql(
        "PREFIX m: <m#> SELECT * WHERE { ?x !(m:knows|m:likes) ?y }"
    )
    assert q.patterns == [("?x", "!m#knows|m#likes", "?y")]
    with pytest.raises(SparqlParseError, match="inverse members"):
        parse_sparql("SELECT * WHERE { ?x !^<p> ?y }")

    got = sorted(
        (r.x, r.y)
        for r in sparql_query(
            quads, "SELECT ?x ?y WHERE { ?x !<knows> ?y }"
        ).collect()
    )
    assert got == [("a", "Person"), ("b", "Person"), ("b", "Robot")]
    # composes with a positive pattern through the shared variable
    got2 = sorted(
        (r.x, r.t)
        for r in sparql_query(
            quads,
            "SELECT ?x ?t WHERE { ?x <knows> <b> . ?x !<type> ?t }",
        ).collect()
    )
    assert got2 == [("a", "b"), ("c", "b")]


def test_parse_filter_boolean_expressions():
    """FILTER booleans: || / && with parentheses, IN / NOT IN — the
    parser emits the compiler's recursive node form; a lone leaf stays
    the flat 3-tuple (backwards compatible with every pinned query)."""
    q = parse_sparql(
        """
        PREFIX m: <m#>
        SELECT ?x WHERE {
          ?x <v> ?n .
          FILTER(?n = "1" || ?n = "2")
          FILTER(?n != "9" && CONTAINS(?x, "a"))
          FILTER((?n > 1 || ?n < 0) && ?x != "z")
          FILTER(?x IN ("a", m:b, <http://c>))
          FILTER(?n NOT IN (1, 2))
        }
        """
    )
    assert q.filters == [
        ("or", [("?n", "=", "1"), ("?n", "=", "2")]),
        ("and", [("?n", "!=", "9"), ("?x", "contains", "a")]),
        ("and", [("or", [("?n", ">", 1.0), ("?n", "<", 0.0)]),
                 ("?x", "!=", "z")]),
        ("?x", "in", ("a", "m#b", "http://c")),
        ("?n", "not_in", (1.0, 2.0)),
    ]


def test_parse_filter_boolean_rejections():
    cases = [
        ("SELECT ?x WHERE { ?x <v> ?n . FILTER(?x IN ()) }",
         "expected a FILTER value"),
        ("SELECT ?x WHERE { ?x <v> ?n . FILTER(?x NOT ?n) }",
         "expected IN"),
    ]
    for text, msg in cases:
        with pytest.raises(SparqlParseError, match=msg):
            parse_sparql(text)


def test_filter_boolean_execution_and_plan(quads):
    """OR / IN filters execute row-locally: the disjunction never
    reaches a join condition (no BroadcastNestedLoopJoin — the
    OR-of-equalities trap applies to join predicates, not filters),
    and a single-variable OR still pushes below the join into the
    pattern scan that binds it."""
    got = sorted(
        r.x
        for r in sparql_query(
            quads,
            'SELECT ?x WHERE { ?x <knows> ?y . '
            'FILTER(?y = "b" || ?y = "c") }',
        ).collect()
    )
    assert got == ["a", "b", "c"]

    got_in = sorted(
        r.x
        for r in sparql_query(
            quads,
            'SELECT ?x ?t WHERE { ?x <knows> ?y . ?x <type> ?t . '
            'FILTER(?t IN ("Person") && (?x = "a" || ?x = "b")) }',
        ).collect()
    )
    assert got_in == ["a", "b"]

    df = sparql_query(
        quads,
        'SELECT ?x ?t WHERE { ?x <knows> ?y . ?x <type> ?t . '
        'FILTER(?t = "Person" || ?t = "Robot") }',
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    optimized = df._jdf.queryExecution().optimizedPlan().toString()
    # the ?t disjunction binds one variable -> lands in the scan-side
    # filter (below the join), not above it
    join_pos = optimized.find("Join")
    or_pos = optimized.find("Robot")
    assert join_pos != -1 and or_pos > join_pos


def test_parse_filter_expressions():
    """FILTER expression surface: var-var comparison, arithmetic,
    string functions, bare boolean functions, and '!' — the parser
    emits ('cmp', op, lhs, rhs) / ('bool', ast) / ('not', node) while
    a plain '?var op literal' leaf STAYS the flat 3-tuple (including
    IRI/PNAME values — backwards compatible with every pinned query)."""
    q = parse_sparql(
        """
        PREFIX m: <m#>
        SELECT ?s WHERE {
          ?s <a> ?a . ?s <b> ?b .
          FILTER(?a < ?b)
          FILTER(?a + 1 > 10)
          FILTER(STRLEN(?a) >= 3)
          FILTER(!BOUND(?b))
          FILTER(STRSTARTS(?a, "info:") && SUBSTR(?a, 2, 3) = "bcd")
          FILTER(CONTAINS(LCASE(?a), "x"))
          FILTER(CONTAINS(?a, "x"))
          FILTER(?a = m:b)
        }
        """
    )
    assert q.filters == [
        ("cmp", "<", ("var", "?a"), ("var", "?b")),
        ("cmp", ">", ("arith", "+", ("var", "?a"), ("const", 1.0)),
         ("const", 10.0)),
        ("cmp", ">=", ("strlen", ("var", "?a")), ("const", 3.0)),
        ("not", ("bool", ("bound", "?b"))),
        ("and", [
            ("bool", ("strstarts", ("var", "?a"), ("const", "info:"))),
            ("cmp", "=", ("substr", ("var", "?a"), 2, 3),
             ("const", "bcd")),
        ]),
        ("bool", ("contains_f", ("lcase", ("var", "?a")),
                  ("const", "x"))),
        ("?a", "contains", "x"),  # legacy leaf preserved
        ("?a", "=", "m#b"),  # legacy leaf, PNAME value
    ]


def test_parse_filter_expression_rejections():
    cases = [
        ('SELECT ?x WHERE { ?x <v> ?n . FILTER(LANG(?n) = "en") }',
         "expression supports"),
        ("SELECT ?x WHERE { ?x <v> ?n . FILTER(STRLEN(?n)) }",
         "comparison operator"),
        ("SELECT ?x WHERE { ?x <v> ?n . FILTER(BOUND(STRLEN(?n))) }",
         "BOUND takes"),
        ("SELECT ?x WHERE { ?x <v> ?n . FILTER(STRLEN(?n) IN (1)) }",
         "plain .var"),
        ("SELECT ?x WHERE { ?x <v> ?n . FILTER(SUBSTR(?n, ?n) = \"a\") }",
         "SUBSTR start"),
    ]
    for text, msg in cases:
        with pytest.raises(SparqlParseError, match=msg):
            parse_sparql(text)


def test_filter_expression_execution(spark):
    """Semantics of expression FILTERs: var-var ordering is LEXICAL
    when both sides are string-typed; any numeric-typed side (literal,
    arithmetic, STRLEN) flips the comparison to try_cast(double) and a
    non-numeric binding DROPS (SPARQL type error), never aborts under
    ANSI; SUBSTR is 1-based; '!' negates through three-valued logic."""
    rows = [
        ("s1", "p:a", "5"), ("s1", "p:b", "7"),
        ("s2", "p:a", "9"), ("s2", "p:b", "3"),
        ("s3", "p:a", "abc"), ("s3", "p:b", "2"),
        ("s4", "p:a", "info:fedora/x"),
    ]
    t = spark.createDataFrame(
        rows, "subj string, pred string, obj_value string"
    )

    def run(q):
        return sorted(r.s for r in sparql_query(t, q).collect())

    # lexical var-var: '5'<'7' only
    assert run(
        "SELECT ?s WHERE { ?s <p:a> ?a . ?s <p:b> ?b . FILTER(?a < ?b) }"
    ) == ["s1"]
    # numeric via arithmetic: 'abc' drops instead of aborting
    assert run(
        "SELECT ?s WHERE { ?s <p:a> ?a . FILTER(?a + 0 > 4) }"
    ) == ["s1", "s2"]
    # var-var arithmetic: 9-3 > 1
    assert run(
        "SELECT ?s WHERE { ?s <p:a> ?a . ?s <p:b> ?b . "
        "FILTER(?a - ?b > 1) }"
    ) == ["s2"]
    assert run(
        "SELECT ?s WHERE { ?s <p:a> ?a . FILTER(STRLEN(?a) >= 3) }"
    ) == ["s3", "s4"]
    assert run(
        "SELECT ?s WHERE { ?s <p:a> ?a . FILTER(SUBSTR(?a, 1, 4) = \"info\") }"
    ) == ["s4"]
    assert run(
        "SELECT ?s WHERE { ?s <p:a> ?a . "
        "FILTER(STRSTARTS(?a, \"info:\") || CONTAINS(LCASE(?a), \"bc\")) }"
    ) == ["s3", "s4"]
    assert run(
        "SELECT ?s WHERE { ?s <p:a> ?a . FILTER(UCASE(?a) != ?a) }"
    ) == ["s3", "s4"]
    assert run(
        "SELECT ?s WHERE { ?s <p:a> ?a . FILTER(!STRSTARTS(?a, \"info:\")) }"
    ) == ["s1", "s2", "s3"]


def test_filter_bound_optional_and_pushdown(quads):
    """!BOUND(?t) over an OPTIONAL binding keeps exactly the solutions
    whose group did not match (find-the-absent); BOUND(?t) keeps the
    complement. A single-variable expression filter (STRSTARTS on the
    required pattern's own variable) still pushes below the join into
    the scan that binds it."""
    got = sorted(
        r.x
        for r in sparql_query(
            quads,
            "SELECT ?x WHERE { ?x <knows> ?y . "
            "OPTIONAL { ?x <type> ?t } FILTER(!BOUND(?t)) }",
        ).collect()
    )
    assert got == ["c"]  # a and b have types; c does not
    got_pos = sorted(
        r.x
        for r in sparql_query(
            quads,
            "SELECT ?x WHERE { ?x <knows> ?y . "
            "OPTIONAL { ?x <type> ?t } FILTER(BOUND(?t)) }",
        ).collect()
    )
    # bag semantics: b matches its OPTIONAL twice (Person + Robot)
    assert got_pos == ["a", "b", "b"]

    df = sparql_query(
        quads,
        "SELECT ?x ?t WHERE { ?x <knows> ?y . ?x <type> ?t . "
        "FILTER(STRSTARTS(?t, \"Pers\")) }",
    )
    optimized = df._jdf.queryExecution().optimizedPlan().toString()
    join_pos = optimized.find("Join")
    pred_pos = optimized.find("Pers")
    assert join_pos != -1 and pred_pos > join_pos


def test_unspaced_arithmetic_and_substr_validation():
    """Review fixes: the lexer's signed-NUMBER rule must not eat the
    operator of unspaced arithmetic ('?a+1'), * keeps precedence over
    a re-read '+', and SUBSTR only accepts the (start >= 1, length >=
    0) integer region where Spark substring == fn:substring."""
    q = parse_sparql("SELECT ?s WHERE { ?s <v> ?a . FILTER(?a+1 > 2) }")
    assert q.filters == [
        ("cmp", ">", ("arith", "+", ("var", "?a"), ("const", 1.0)),
         ("const", 2.0))
    ]
    q2 = parse_sparql(
        "SELECT ?s WHERE { ?s <v> ?a . FILTER(?a+1*2 > 2) }"
    )
    assert q2.filters == [
        ("cmp", ">",
         ("arith", "+", ("var", "?a"),
          ("arith", "*", ("const", 1.0), ("const", 2.0))),
         ("const", 2.0))
    ]
    q3 = parse_sparql("SELECT ?s WHERE { ?s <v> ?a . FILTER(?a-1 < 0) }")
    assert q3.filters[0][2] == ("arith", "-", ("var", "?a"), ("const", 1.0))
    for bad, msg in [
        ('FILTER(SUBSTR(?a, -1) = "x")', "SUBSTR start"),
        ('FILTER(SUBSTR(?a, 0) = "x")', "SUBSTR start"),
        ('FILTER(SUBSTR(?a, 2.5) = "x")', "SUBSTR start"),
        ('FILTER(SUBSTR(?a, 1, -2) = "x")', "SUBSTR length"),
    ]:
        with pytest.raises(SparqlParseError, match=msg):
            parse_sparql("SELECT ?s WHERE { ?s <v> ?a . " + bad + " }")


def test_having_on_group_key_leaf(spark):
    """A single-leaf HAVING over a GROUP KEY (not an aggregate alias)
    must work like its compound-expression form — both are in scope."""
    rows = [("a", "knows", "b"), ("a", "knows", "c"), ("b", "knows", "c")]
    t = spark.createDataFrame(
        rows, "subj string, pred string, obj_value string"
    )
    got = sorted(
        (r.x, r.n)
        for r in sparql_query(
            t,
            'SELECT ?x (COUNT(*) AS ?n) WHERE { ?x <knows> ?y } '
            'GROUP BY ?x HAVING(?x = "a")',
        ).collect()
    )
    assert got == [("a", 2)]


def test_aggregate_order_limit_topk(spark):
    """GROUP BY .. ORDER BY DESC(?n) LIMIT k executes (top-k idiom),
    sorts on group keys too, applies OFFSET, and plans as
    TakeOrderedAndProject — no global sort materialization."""
    rows = [("a", "knows", x) for x in "bcd"] + \
           [("b", "knows", x) for x in "cd"] + [("c", "knows", "a")]
    t = spark.createDataFrame(
        rows, "subj string, pred string, obj_value string"
    )
    df = sparql_query(
        t,
        "SELECT ?x (COUNT(*) AS ?n) WHERE { ?x <knows> ?y } "
        "GROUP BY ?x ORDER BY DESC(?n) ?x LIMIT 2",
    )
    assert [(r.x, r.n) for r in df.collect()] == [("a", 3), ("b", 2)]
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan, plan
    got_off = [
        (r.x, r.n)
        for r in sparql_query(
            t,
            "SELECT ?x (COUNT(*) AS ?n) WHERE { ?x <knows> ?y } "
            "GROUP BY ?x ORDER BY DESC(?n) ?x LIMIT 2 OFFSET 1",
        ).collect()
    ]
    assert got_off == [("b", 2), ("c", 1)]


def test_having_boolean_expressions(spark):
    """HAVING accepts the full FILTER boolean grammar over aggregate
    aliases AND group keys; the single-leaf form (with its historical
    quoted-number coercion) still parses to the flat 3-tuple."""
    rows = [("a", "knows", "b"), ("a", "knows", "c"), ("a", "knows", "d"),
            ("b", "knows", "c"), ("c", "knows", "a"), ("c", "knows", "b")]
    t = spark.createDataFrame(
        rows, "subj string, pred string, obj_value string"
    )
    q = parse_sparql(
        'SELECT ?x (COUNT(*) AS ?n) WHERE { ?x <knows> ?y } '
        'GROUP BY ?x HAVING(?n >= 2 && ?n < 3 || ?x = "a")'
    )
    assert q.having == [
        ("or", [("and", [("?n", ">=", 2.0), ("?n", "<", 3.0)]),
                ("?x", "=", "a")])
    ]
    got = sorted(
        (r.x, r.n)
        for r in sparql_query(
            t,
            'SELECT ?x (COUNT(*) AS ?n) WHERE { ?x <knows> ?y } '
            'GROUP BY ?x HAVING(?n >= 2 && ?n < 3 || ?x = "a")',
        ).collect()
    )
    assert got == [("a", 3), ("c", 2)]
    got2 = sorted(
        (r.x, r.n)
        for r in sparql_query(
            t,
            'SELECT ?x (COUNT(*) AS ?n) WHERE { ?x <knows> ?y } '
            'GROUP BY ?x HAVING(!(?n = 1) && ?n + 0 < 3)',
        ).collect()
    )
    assert got2 == [("c", 2)]
    # single-leaf path unchanged (quoted number coerces)
    q2 = parse_sparql(
        'SELECT (COUNT(*) AS ?n) WHERE { ?x <knows> ?y } '
        'GROUP BY ?x HAVING(?n > "1")'
    )
    assert q2.having == [("n", ">", 1.0)]
    # unknown alias in an expression node still rejected at compile
    import pytest as _pytest

    from fcrepo3_rdf_extractor_spark.operators.bgp import bgp_aggregate
    with _pytest.raises(ValueError, match="unknown aggregate alias"):
        bgp_aggregate(
            t, [("?x", "<knows>", "?y")], group_by=["x"],
            aggs=[("count", "*", "n")],
            having=[("and", [("?n", ">", 1.0), ("?zz", "<", 2.0)])],
        ).collect()


def test_filter_not_in_and_empty_or_compiler(quads):
    from fcrepo3_rdf_extractor_spark.operators.bgp import bgp_query

    got = sorted(
        r.x
        for r in bgp_query(
            quads,
            [("?x", "knows", "?y")],
            select=["x"],
            filters=[("?y", "not_in", ("c",))],
        ).collect()
    )
    assert got == ["a", "c"]
    with pytest.raises(ValueError, match="non-empty list"):
        bgp_query(
            quads,
            [("?x", "knows", "?y")],
            filters=[("?y", "in", ())],
        ).collect()
    with pytest.raises(ValueError, match="empty OR"):
        bgp_query(
            quads,
            [("?x", "knows", "?y")],
            filters=[("or", [])],
        ).collect()


def test_select_expressions(quads):
    """SPARQL 1.1 SELECT expressions: (expr AS ?v) is sugar for a
    projected BIND — same grammar, same rebind validation."""
    q = parse_sparql(
        'SELECT ?x (CONCAT(?x, "!") AS ?bang) (1 + 2 AS ?three) '
        "WHERE { ?x <knows> ?y }"
    )
    assert q.select == ["x", "bang", "three"]
    assert [v for v, _ in q.binds] == ["?bang", "?three"]

    rows = sorted(
        (r.x, r.bang, r.three)
        for r in sparql_query(
            quads,
            'SELECT ?x (CONCAT(?x, "!") AS ?bang) (1 + 2 AS ?three) '
            "WHERE { ?x <knows> ?y }",
        ).collect()
    )
    assert rows == [("a", "a!", 3.0), ("b", "b!", 3.0), ("c", "c!", 3.0)]

    with pytest.raises(SparqlParseError, match="rebind"):
        parse_sparql('SELECT (STR(?y) AS ?x) WHERE { ?x <knows> ?y }')
    # a SELECT expression mixed into an aggregate SELECT is rejected
    # (the non-grouped-variable check fires before the BIND one)
    with pytest.raises(SparqlParseError, match="non-grouped variables"):
        parse_sparql(
            'SELECT (STR(?x) AS ?s) (COUNT(*) AS ?n) '
            "WHERE { ?x <knows> ?y } GROUP BY ?x"
        )


def test_filter_on_optional_binding(quads):
    """A top-level FILTER referencing an OPTIONAL-bound variable defers
    until after the left join (SPARQL §18.2.2.2 group scope): a
    solution where the optional did not match carries an unbound
    binding, the comparison is a type error, and the row drops —
    Spark's NULL comparison gives exactly that."""
    rows = sorted(
        (r.x, r.t)
        for r in sparql_query(
            quads,
            "SELECT ?x ?t WHERE { ?x <knows> ?y . "
            'OPTIONAL { ?x <type> ?t } FILTER(?t = "Person") }',
        ).collect()
    )
    # a knows b + a type Person; b knows c + b type Person; c has no
    # type row -> its solution has ?t unbound -> dropped by the filter
    assert rows == [("a", "Person"), ("b", "Person")]

    # mixing required and optional vars in one boolean node also defers
    rows2 = sorted(
        (r.x, r.t)
        for r in sparql_query(
            quads,
            "SELECT ?x ?t WHERE { ?x <knows> ?y . "
            'OPTIONAL { ?x <type> ?t } FILTER(?t = "Robot" || ?x = "a") }',
        ).collect()
    )
    assert rows2 == [("a", "Person"), ("b", "Robot")]

    # a filter variable bound nowhere still raises
    with pytest.raises(ValueError, match="not bound by any pattern"):
        bgp_query(
            quads,
            [("?x", "knows", "?y")],
            filters=[("?nope", "=", "x")],
        ).collect()


def test_nested_optional_and_group_filter(quads):
    """OPTIONAL groups are full sub-groups: nestable, with FILTERs
    scoped to whether the group MATCHES (the solution survives with
    NULLs either way — contrast the top-level filter, which drops it)."""
    # group-scoped filter: c knows b, but the optional's type rows are
    # filtered to Robot only — a and c keep their solutions with NULLs
    rows = sorted(
        (r.x, str(r.t))
        for r in sparql_query(
            quads,
            "SELECT ?x ?t WHERE { ?x <knows> ?y . "
            'OPTIONAL { ?x <type> ?t . FILTER(?t = "Robot") } }',
        ).collect()
    )
    assert rows == [("a", "None"), ("b", "Robot"), ("c", "None")]

    # nested OPTIONAL: the inner group hangs off the outer's binding
    rows2 = sorted(
        (r.x, str(r.z), str(r.t))
        for r in sparql_query(
            quads,
            "SELECT ?x ?z ?t WHERE { ?x <type> ?t . "
            "OPTIONAL { ?x <knows> ?z . OPTIONAL { ?z <type> ?zt . "
            'FILTER(?zt = "Robot") } } }',
        ).collect()
    )
    # a type Person, knows b; b type Person+Robot, knows c (c untyped)
    assert ("a", "b", "Person") in rows2
    assert ("b", "c", "Person") in rows2 and ("b", "c", "Robot") in rows2

    # programmatic sub-group mapping form, equivalence with text
    prog = bgp_query(
        quads,
        [("?x", "knows", "?y")],
        select=["x", "t"],
        optional_patterns=[{
            "patterns": [("?x", "type", "?t")],
            "filters": [("?t", "=", "Robot")],
        }],
    )
    assert rows == sorted((r.x, str(r.t)) for r in prog.collect())

    # rejections: group filter on a variable the group doesn't bind;
    # BIND/VALUES/MINUS inside OPTIONAL
    with pytest.raises(ValueError, match="not bound by any pattern"):
        bgp_query(
            quads,
            [("?x", "knows", "?y")],
            optional_patterns=[{
                "patterns": [("?x", "type", "?t")],
                "filters": [("?y", "=", "b")],
            }],
        ).collect()
    with pytest.raises(SparqlParseError, match="BIND inside OPTIONAL"):
        parse_sparql(
            "SELECT * WHERE { ?x <p> ?y . "
            "OPTIONAL { ?x <q> ?z . BIND(STR(?z) AS ?s) } }"
        )
    with pytest.raises(SparqlParseError, match="EXISTS inside OPTIONAL"):
        parse_sparql(
            "SELECT * WHERE { ?x <p> ?y . "
            "OPTIONAL { ?x <q> ?z . FILTER EXISTS { ?z <r> ?w } } }"
        )
    # patterns-only group still parses to the plain list (pins intact)
    q = parse_sparql("SELECT * WHERE { ?x <p> ?y . OPTIONAL { ?x <q> ?z } }")
    assert q.optional_patterns == [[("?x", "<q>", "?z")]]


def test_subqueries(quads):
    """SPARQL §12 subqueries: bottom-up evaluation, joined on shared
    variables; a group-less aggregate subquery is a scalar attached
    via the 1-row broadcast; SELECT * includes subquery columns and
    FILTER may reference its aliases."""
    got = sorted(
        (r.x, r.y, r.n)
        for r in sparql_query(
            quads,
            "SELECT ?x ?y ?n WHERE { ?x <knows> ?y . "
            "{ SELECT ?y (COUNT(*) AS ?n) WHERE { ?z <knows> ?y } "
            "GROUP BY ?y } }",
        ).collect()
    )
    assert got == [("a", "b", 2), ("b", "c", 1), ("c", "b", 2)]

    scal = sorted(
        (r.x, r.total)
        for r in sparql_query(
            quads,
            "SELECT ?x ?total WHERE { ?x <knows> ?y . "
            "{ SELECT (COUNT(*) AS ?total) WHERE { ?a <type> ?b } } }",
        ).collect()
    )
    assert scal == [("a", 3), ("b", 3), ("c", 3)]

    star = sparql_query(
        quads,
        "SELECT * WHERE { ?x <knows> ?y . "
        "{ SELECT ?y (COUNT(*) AS ?n) WHERE { ?z <knows> ?y } GROUP BY ?y }"
        " FILTER(?n >= 2) }",
    )
    assert star.columns == ["x", "y", "n"]
    assert sorted((r.x, r.y, r.n) for r in star.collect()) == [
        ("a", "b", 2), ("c", "b", 2)
    ]

    # the scalar shape never BNLJ-explodes a non-scalar: a plain
    # (non-aggregate) subquery sharing no variable is rejected
    with pytest.raises(ValueError, match="cartesian"):
        sparql_query(
            quads,
            "SELECT * WHERE { ?x <knows> ?y . "
            "{ SELECT ?t WHERE { ?a <type> ?t } } }",
        ).collect()

    cases = [
        ("SELECT ?n WHERE { { SELECT (COUNT(*) AS ?n) WHERE "
         "{ ?a <p> ?b } } }", "at least one triple"),
        ("SELECT * WHERE { ?x <p> ?y . { ?x <q> ?z } }",
         "only '\\{ SELECT"),
        ("ASK { ?x <p> ?y . { SELECT ?x WHERE { ?x <q> ?z } } }",
         "SELECT queries only"),
        ("SELECT * WHERE { ?x <p> ?y . { SELECT ?z WHERE { ?z <q> ?w . "
         "{ SELECT ?w WHERE { ?w <r> ?v } } } } }", "one level"),
    ]
    for text, msg in cases:
        with pytest.raises(SparqlParseError, match=msg):
            parse_sparql(text)


def test_numeric_filter_type_error_drops_not_aborts(spark):
    """SPARQL type-error semantics under Spark 4's default ANSI mode:
    a numeric FILTER ('=', '!=', IN, NOT IN) over a non-numeric
    binding must DROP the row (try_cast -> NULL), never abort the job
    with CAST_INVALID_INPUT (a raw comparison/isin against a number
    implicitly casts the string column)."""
    t = spark.createDataFrame(
        [("a", "age", "30"), ("b", "age", "forty"), ("c", "age", "40")],
        "subj string, pred string, obj_value string",
    )
    q = 'SELECT ?x WHERE { ?x <age> ?n . FILTER(%s) }'
    assert sorted(
        r.x for r in sparql_query(t, q % "?n IN (30, 40)").collect()
    ) == ["a", "c"]
    assert sorted(
        r.x for r in sparql_query(t, q % "?n = 30").collect()
    ) == ["a"]
    assert sorted(
        r.x for r in sparql_query(t, q % "?n != 30").collect()
    ) == ["c"]  # 'forty' is a type error, not "different from 30"
    # mixed-type list: numeric arm via try_cast, string arm lexical
    assert sorted(
        r.x for r in sparql_query(t, q % '?n NOT IN (30, "forty")').collect()
    ) == ["c"]


def test_union_branch_filters_and_optional(quads):
    """UNION branches are sub-groups: each may carry its own FILTERs
    and OPTIONAL groups, scoped to that branch; plain pattern-list
    branches keep their original parsed form."""
    q = parse_sparql(
        'SELECT ?x ?v WHERE { { ?x <knows> ?v . FILTER(?v = "b") } UNION '
        '{ ?x <type> ?v . OPTIONAL { ?x <knows> ?k } '
        'FILTER(?v != "Robot") } }'
    )
    assert q.union_branches[0] == {
        "patterns": [("?x", "<knows>", "?v")],
        "optional": [],
        "filters": [("?v", "=", "b")],
    }
    assert q.union_branches[1]["optional"] == [[("?x", "<knows>", "?k")]]

    got = sorted(
        (r.x, r.v)
        for r in sparql_query(
            quads,
            'SELECT ?x ?v WHERE { { ?x <knows> ?v . FILTER(?v = "b") } '
            'UNION { ?x <type> ?v . FILTER(?v != "Robot") } }',
        ).collect()
    )
    assert got == [("a", "Person"), ("a", "b"), ("b", "Person"), ("c", "b")]

    # plain branches still parse to bare pattern lists (pins intact)
    q2 = parse_sparql(
        "SELECT ?x ?c WHERE { { ?x <knows> ?c } UNION { ?x <type> ?c } }"
    )
    assert q2.union_branches == [
        [("?x", "<knows>", "?c")], [("?x", "<type>", "?c")]
    ]
