"""Cypher-subset parser (MATCH / WHERE / RETURN).

Covers the surface the reference's transpiler tests exercise
(raphtory-cypher/src/transpiler/mod.rs:1216-1687, grammar
raphtory-cypher/src/parser/cypher.pest): linear MATCH chains with
direction ``->`` / ``<-`` / undirected, comma-separated patterns sharing
node variables, ``:LAYER`` edge labels and ``{key: lit}`` inline property
maps, WHERE with comparisons / arithmetic / CONTAINS / STARTS WITH /
ENDS WITH / AND / OR / NOT, and RETURN with ``*``, aliases, DISTINCT,
``type(e)``, aggregates (count/sum/avg/min/max, count(DISTINCT x)),
ORDER BY and LIMIT. Round 4 adds ``WITH`` pipeline stages (projection /
aggregation / DISTINCT with a post-WHERE), ``OPTIONAL MATCH`` clauses,
variable-length relationship ranges ``[*lo..hi]`` (the reference
grammar's RangeLiteral, cypher.pest:204), ``IS [NOT] NULL``
(is_null_op, cypher.pest:226), ``XOR`` (bin_op, cypher.pest:211),
``SKIP`` (cypher.pest:136) and ``UNION [ALL]`` query chaining
(cypher.pest:18). Hand-rolled recursive descent — no parser library in
the container, and the subset is small.
"""

from __future__ import annotations

from dataclasses import dataclass, field


# ----------------------------------------------------------------- AST

@dataclass
class NodePat:
    var: str | None
    label: str | None = None          # (n:Type) → node_type filter
    props: dict = field(default_factory=dict)


@dataclass
class EdgePat:
    var: str | None
    layer: str | None = None          # [e:LAYER]
    props: dict = field(default_factory=dict)
    direction: str = "right"          # right | left | undirected
    var_length: tuple | None = None   # [*lo..hi] → (lo, hi); hi may be None


@dataclass
class Chain:
    """node (edge node)* — one linear MATCH pattern."""
    nodes: list
    edges: list                       # len(nodes) == len(edges) + 1


@dataclass
class Prop:
    var: str
    name: str


@dataclass
class Var:
    name: str


@dataclass
class Lit:
    value: object


@dataclass
class Func:
    name: str                         # count | sum | avg | min | max | type
    arg: object                       # Expr, or None for count(*)
    distinct: bool = False


@dataclass
class BinOp:
    op: str
    left: object
    right: object


@dataclass
class Not:
    expr: object


@dataclass
class Case:
    """CASE expression — both forms (cypher.pest `case_expression`):
    simple ``CASE x WHEN v THEN r ... [ELSE d] END`` (operand set) and
    searched ``CASE WHEN pred THEN r ... [ELSE d] END`` (operand None).
    Missing ELSE ⇒ ``Lit(None)``, per openCypher."""
    operand: object | None
    whens: list                       # [(when_expr, then_expr)]
    default: object


@dataclass
class ReturnItem:
    expr: object
    alias: str | None


@dataclass
class WithClause:
    """WITH [DISTINCT] items [WHERE expr] — Cypher's pipeline stage.
    ``where`` filters AFTER the projection/aggregation (HAVING-like),
    matching openCypher's WITH ... WHERE semantics."""
    items: list                       # [ReturnItem]
    distinct: bool
    where: object | None


@dataclass
class Segment:
    """One MATCH [WHERE] stage feeding a WITH clause, plus any trailing
    OPTIONAL MATCH [WHERE] clauses (left-outer patterns)."""
    chains: list
    where: object | None
    optional: list = field(default_factory=list)  # [(chains, where)]


@dataclass
class Query:
    chains: list
    where: object | None
    items: list                       # [ReturnItem]; empty ⇒ RETURN *
    star: bool
    distinct: bool
    order_by: list                    # [(expr, ascending)]
    limit: int | None
    pre: list = field(default_factory=list)   # [(Segment, WithClause)]
    optional: list = field(default_factory=list)  # final [(chains, where)]
    skip: int | None = None           # SKIP n (applied before LIMIT)
    union: list = field(default_factory=list)  # [(Query, all: bool)]
    unwind: list = field(default_factory=list)  # [(values, name)]


# ------------------------------------------------------------- tokens

_PUNCT = ["<=", ">=", "<>", "->", "<-", "..", "=~", "(", ")", "[", "]",
          "{", "}", ",", ":", ".", "-", "=", "<", ">", "+", "*", "/", "%"]
_KEYWORDS = {"match", "where", "return", "distinct", "as", "order", "by",
             "asc", "desc", "limit", "and", "or", "not", "contains",
             "starts", "ends", "with", "null", "optional", "is", "xor",
             "skip", "union", "all", "unwind", "in",
             "case", "when", "then", "else", "end"}
_AGGS = {"count", "sum", "avg", "min", "max", "collect",
         "stdev", "stdevp", "percentilecont", "percentiledisc"}
#: scalar (non-aggregate) functions the compiler evaluates per row — the
#: reference transpiles any FunctionInvocation straight to DataFusion SQL
#: (transpiler/mod.rs:1082), so this is the equivalent built-in set
_SCALAR_FNS = {"type", "size", "id", "coalesce", "length",
               "startnode", "endnode",
               "abs", "tointeger",
               "tofloat", "tolower", "toupper", "trim",
               "ltrim", "rtrim", "reverse", "tostring",
               "round", "floor", "ceil", "sqrt", "sign",
               "replace", "substring", "split", "left", "right"}


def _tokenize(src: str) -> list:
    toks, i, n = [], 0, len(src)
    while i < n:
        c = src[i]
        if c.isspace():
            i += 1
            continue
        if c in "'\"":
            j = i + 1
            while j < n and src[j] != c:
                j += 1
            if j >= n:
                raise SyntaxError(f"unterminated string at {i}")
            toks.append(("str", src[i + 1:j]))
            i = j + 1
            continue
        if c.isdigit():
            # consume digits + at most ONE decimal point, and never a
            # ".." (range operator in [*1..3]); "1.2.3" stops after "1.2"
            # and the dangling ".3" fails downstream as a SyntaxError
            j, seen_dot = i, False
            while j < n and (src[j].isdigit()
                             or (src[j] == "." and not seen_dot
                                 and not src.startswith("..", j)
                                 and j + 1 < n and src[j + 1].isdigit())):
                if src[j] == ".":
                    seen_dot = True
                j += 1
            # scientific notation (cypher.pest ExponentDecimalReal):
            # digits [e|E] [+|-] digits — only when an exponent digit
            # actually follows, so identifiers like '1end' stay two tokens
            if j < n and src[j] in "eE":
                k = j + 1
                if k < n and src[k] in "+-":
                    k += 1
                if k < n and src[k].isdigit():
                    while k < n and src[k].isdigit():
                        k += 1
                    seen_dot = True          # exponent form is a float
                    j = k
            text = src[i:j]
            try:
                toks.append(("num",
                             float(text) if seen_dot else int(text)))
            except ValueError:
                raise SyntaxError(f"bad numeric literal {text!r} at {i}")
            i = j
            continue
        if c.isalpha() or c == "_":
            j = i
            while j < n and (src[j].isalnum() or src[j] == "_"):
                j += 1
            word = src[i:j]
            low = word.lower()
            if low in _KEYWORDS:
                toks.append(("kw", low))
            else:
                toks.append(("ident", word))
            i = j
            continue
        for p in _PUNCT:
            if src.startswith(p, i):
                toks.append(("punct", p))
                i += len(p)
                break
        else:
            raise SyntaxError(f"unexpected character {c!r} at {i}")
    toks.append(("eof", None))
    return toks


# ------------------------------------------------------------- parser

class _P:
    def __init__(self, toks):
        self.toks = toks
        self.i = 0

    def peek(self, k=0):
        return self.toks[min(self.i + k, len(self.toks) - 1)]

    def next(self):
        t = self.toks[self.i]
        self.i += 1
        return t

    def expect(self, kind, val=None):
        t = self.next()
        if t[0] != kind or (val is not None and t[1] != val):
            raise SyntaxError(f"expected {val or kind}, got {t}")
        return t

    def accept(self, kind, val=None):
        t = self.peek()
        if t[0] == kind and (val is None or t[1] == val):
            self.i += 1
            return True
        return False

    # -- patterns ------------------------------------------------------
    def _match_where(self):
        self.expect("kw", "match")
        chains = [self.chain()]
        while self.accept("punct", ","):
            chains.append(self.chain())
        where = None
        if self.accept("kw", "where"):
            where = self.expr()
        return chains, where

    def _with_clause(self) -> WithClause:
        distinct = self.accept("kw", "distinct")
        items = [self.ret_item()]
        while self.accept("punct", ","):
            items.append(self.ret_item())
        where = None
        if self.accept("kw", "where"):
            where = self.expr()
        return WithClause(items, distinct, where)

    def _optional_matches(self) -> list:
        optional = []
        while self.peek() == ("kw", "optional"):
            self.next()
            ochains, owhere = self._match_where()
            optional.append((ochains, owhere))
        return optional

    def parse(self) -> Query:
        q = self.parse_one()
        # UNION [ALL] chains whole queries (cypher.pest:18 Union); the
        # combined result dedups across branches unless ALL
        while self.accept("kw", "union"):
            all_ = self.accept("kw", "all")
            q.union.append((self.parse_one(), all_))
        self.expect("eof")
        return q

    def parse_one(self) -> Query:
        # leading UNWIND <list-literal> AS var clauses (cypher.pest:54);
        # the subset takes literal lists only (no expressions yet)
        unwind = []
        while self.accept("kw", "unwind"):
            e = self.expr()
            if not isinstance(e, Lit) or not isinstance(e.value, list):
                raise NotImplementedError(
                    "UNWIND supports literal lists only")
            self.expect("kw", "as")
            unwind.append((e.value, self.expect("ident")[1]))
        pre = []
        if unwind and self.peek() != ("kw", "match"):
            chains, where, optional = [], None, []   # UNWIND ... RETURN
        else:
            chains, where = self._match_where()
            optional = self._optional_matches()
        while self.accept("kw", "with"):
            pre.append((Segment(chains, where, optional),
                        self._with_clause()))
            if self.peek() == ("kw", "match"):
                chains, where = self._match_where()
                optional = self._optional_matches()
            else:
                chains, where, optional = [], None, []
        self.expect("kw", "return")
        distinct = self.accept("kw", "distinct")
        star, items = False, []
        if self.accept("punct", "*"):
            star = True
        else:
            items.append(self.ret_item())
            while self.accept("punct", ","):
                items.append(self.ret_item())
        order_by = []
        if self.accept("kw", "order"):
            self.expect("kw", "by")
            order_by.append(self.order_item())
            while self.accept("punct", ","):
                order_by.append(self.order_item())
        skip = None
        if self.accept("kw", "skip"):
            skip = int(self.expect("num")[1])
        limit = None
        if self.accept("kw", "limit"):
            limit = int(self.expect("num")[1])
        return Query(chains, where, items, star, distinct, order_by, limit,
                     pre, optional, skip, unwind=unwind)

    def chain(self) -> Chain:
        # p = shortestPath((a)-[*..k]->(b))  (round 5; Neo4j §4.6 path
        # functions): desugars onto the min-hops var-length binding — the
        # engine's length(p) contract IS the shortest qualifying walk
        # length, so the pattern needs no new runtime machinery.
        if (self.peek()[0] == "ident"
                and self.peek(1) == ("punct", "=")
                and self.peek(2)[0] == "ident"
                and self.peek(2)[1].lower() in ("shortestpath",
                                                "allshortestpaths")):
            # allShortestPaths is an alias here: the engine's output is
            # PAIR-level (endpoints + min length), where the two Neo4j
            # functions coincide — path ENUMERATION is out of scope
            pvar = self.next()[1]
            self.next()                       # =
            self.next()                       # shortestPath
            self.expect("punct", "(")
            inner = self.chain()
            self.expect("punct", ")")
            if len(inner.edges) != 1:
                raise SyntaxError(
                    "shortestPath takes a single relationship pattern")
            ep = inner.edges[0]
            if ep.var_length is None:
                ep.var_length = (1, 1)
            if ep.var is None:
                ep.var = pvar
            elif ep.var != pvar:
                raise SyntaxError(
                    f"shortestPath path variable {pvar!r} conflicts with "
                    f"relationship variable {ep.var!r}")
            return inner
        nodes = [self.node_pat()]
        edges = []
        while self.peek() in (("punct", "-"), ("punct", "<-")):
            edges.append(self.edge_pat())
            nodes.append(self.node_pat())
        return Chain(nodes, edges)

    def node_pat(self) -> NodePat:
        self.expect("punct", "(")
        var = label = None
        props = {}
        if self.peek()[0] == "ident":
            var = self.next()[1]
        if self.accept("punct", ":"):
            label = self.expect("ident")[1]
        if self.peek() == ("punct", "{"):
            props = self.prop_map()
        self.expect("punct", ")")
        return NodePat(var, label, props)

    def edge_pat(self) -> EdgePat:
        left_in = self.accept("punct", "<-")
        if not left_in:
            self.expect("punct", "-")
        var = layer = None
        props = {}
        var_length = None
        if self.accept("punct", "["):
            if self.peek()[0] == "ident":
                var = self.next()[1]
            if self.accept("punct", ":"):
                layer = self.expect("ident")[1]
            if self.accept("punct", "*"):
                # [*] | [*k] | [*lo..hi] | [*..hi] | [*lo..]
                lo, hi = 1, None
                if self.peek()[0] == "num":
                    lo = int(self.next()[1])
                    hi = lo
                if self.accept("punct", ".."):
                    hi = None
                    if self.peek()[0] == "num":
                        hi = int(self.next()[1])
                var_length = (lo, hi)
            if self.peek() == ("punct", "{"):
                props = self.prop_map()
            self.expect("punct", "]")
        if left_in:
            self.expect("punct", "-")
            direction = "left"
        elif self.accept("punct", "->"):
            direction = "right"
        else:
            self.expect("punct", "-")
            direction = "undirected"
        return EdgePat(var, layer, props, direction, var_length)

    def prop_map(self) -> dict:
        self.expect("punct", "{")
        props = {}
        while True:
            key = self.expect("ident")[1]
            self.expect("punct", ":")
            t = self.next()
            if t[0] not in ("num", "str"):
                raise SyntaxError(f"property map literal expected, got {t}")
            props[key] = t[1]
            if not self.accept("punct", ","):
                break
        self.expect("punct", "}")
        return props

    # -- expressions ---------------------------------------------------
    def ret_item(self) -> ReturnItem:
        e = self.expr()
        alias = None
        if self.accept("kw", "as"):
            alias = self.expect("ident")[1]
        return ReturnItem(e, alias)

    def order_item(self):
        e = self.expr()
        asc = True
        if self.accept("kw", "desc"):
            asc = False
        else:
            self.accept("kw", "asc")
        return (e, asc)

    def expr(self):
        return self.or_expr()

    def or_expr(self):
        e = self.xor_expr()
        while self.accept("kw", "or"):
            e = BinOp("or", e, self.xor_expr())
        return e

    def xor_expr(self):
        # openCypher precedence: OR < XOR < AND (cypher.pest:211 bin_op)
        e = self.and_expr()
        while self.accept("kw", "xor"):
            e = BinOp("xor", e, self.and_expr())
        return e

    def and_expr(self):
        e = self.not_expr()
        while self.accept("kw", "and"):
            e = BinOp("and", e, self.not_expr())
        return e

    def not_expr(self):
        if self.accept("kw", "not"):
            return Not(self.not_expr())
        return self.cmp_expr()

    def cmp_expr(self):
        e = self.add_expr()
        t = self.peek()
        if t == ("kw", "is"):
            # IS [NOT] NULL (cypher.pest:226 is_null_op)
            self.next()
            negate = self.accept("kw", "not")
            self.expect("kw", "null")
            e = BinOp("is_null", e, Lit(None))
            return Not(e) if negate else e
        if t == ("punct", "<-"):
            # the tokenizer lexes 'e.w<-5' (no space) as an arrow; in
            # comparison position it is really '<' followed by a negative
            # operand — re-split here
            self.next()
            rhs = self.add_expr()
            if isinstance(rhs, Lit) and isinstance(rhs.value, (int, float)):
                return BinOp("<", e, Lit(-rhs.value))
            return BinOp("<", e, BinOp("-", Lit(0), rhs))
        if t[0] == "punct" and t[1] in ("=", "<>", "<", "<=", ">", ">="):
            self.next()
            return BinOp(t[1], e, self.add_expr())
        if t == ("kw", "in"):
            # x IN [list] (cypher.pest in_op; the reference transpiles a
            # literal-list RHS to SQL InList, transpiler/mod.rs:1024-1048)
            self.next()
            return BinOp("in", e, self.add_expr())
        if t == ("kw", "contains"):
            self.next()
            return BinOp("contains", e, self.add_expr())
        if t == ("kw", "starts"):
            self.next()
            self.expect("kw", "with")
            return BinOp("starts_with", e, self.add_expr())
        if t == ("kw", "ends"):
            self.next()
            self.expect("kw", "with")
            return BinOp("ends_with", e, self.add_expr())
        if t == ("punct", "=~"):
            # x =~ 'pattern' — whole-string regex match, per openCypher
            self.next()
            return BinOp("regex", e, self.add_expr())
        return e

    def add_expr(self):
        e = self.mul_expr()
        while True:
            t = self.peek()
            if t[0] == "punct" and t[1] in ("+", "-"):
                self.next()
                e = BinOp(t[1], e, self.mul_expr())
            else:
                return e

    def mul_expr(self):
        # multiply/divide/modulo bind tighter than +/- (cypher.pest:219)
        e = self.atom()
        while True:
            t = self.peek()
            if t[0] == "punct" and t[1] in ("*", "/", "%"):
                self.next()
                e = BinOp(t[1], e, self.atom())
            else:
                return e

    def atom(self):
        t = self.peek()
        if t == ("punct", "-"):          # unary minus: -5, -(x + 1)
            self.next()
            inner = self.atom()
            if isinstance(inner, Lit) and isinstance(inner.value,
                                                     (int, float)):
                return Lit(-inner.value)
            return BinOp("-", Lit(0), inner)
        if t == ("punct", "("):
            self.next()
            e = self.expr()
            self.expect("punct", ")")
            return e
        if t == ("punct", "["):          # list literal [1, 2, 3]
            self.next()
            vals = []
            if not self.accept("punct", "]"):
                while True:
                    el = self.atom()
                    if not isinstance(el, Lit):
                        raise NotImplementedError(
                            "list literals take literal elements only")
                    vals.append(el.value)
                    if not self.accept("punct", ","):
                        break
                self.expect("punct", "]")
            return Lit(vals)
        if t[0] in ("num", "str"):
            self.next()
            return Lit(t[1])
        if t == ("kw", "null"):
            self.next()
            return Lit(None)
        if t == ("kw", "case"):
            self.next()
            operand = None
            if self.peek() != ("kw", "when"):
                operand = self.expr()
            whens = []
            while self.accept("kw", "when"):
                w = self.expr()
                self.expect("kw", "then")
                whens.append((w, self.expr()))
            if not whens:
                raise SyntaxError("CASE needs at least one WHEN branch")
            default = Lit(None)
            if self.accept("kw", "else"):
                default = self.expr()
            self.expect("kw", "end")
            return Case(operand, whens, default)
        if t[0] == "ident":
            name = self.next()[1]
            if name.lower() in ("true", "false"):
                # boolean literals (reference Literal::Bool,
                # transpiler/mod.rs:1070)
                return Lit(name.lower() == "true")
            if self.accept("punct", "("):       # function call
                low = name.lower()
                distinct = self.accept("kw", "distinct")
                if self.accept("punct", "*"):
                    arg = None
                else:
                    arg = self.expr()
                    if self.peek() == ("punct", ","):
                        args = [arg]            # multi-arg (coalesce)
                        while self.accept("punct", ","):
                            args.append(self.expr())
                        arg = args
                self.expect("punct", ")")
                if low not in _AGGS and low not in _SCALAR_FNS:
                    raise SyntaxError(f"unsupported function {name}")
                return Func(low, arg, distinct)
            if self.accept("punct", "."):
                # property names may collide with keywords (n.end, e.case)
                # — after '.' any word token is a name
                t2 = self.next()
                if t2[0] not in ("ident", "kw"):
                    raise SyntaxError(f"expected property name, got {t2}")
                return Prop(name, t2[1])
            return Var(name)
        raise SyntaxError(f"unexpected token {t}")


def parse_cypher(src: str) -> Query:
    return _P(_tokenize(src)).parse()


def expr_text(e) -> str:
    """Canonical text of a RETURN expression — the default output column
    name, like Cypher's own unaliased column naming."""
    if isinstance(e, Prop):
        return f"{e.var}.{e.name}"
    if isinstance(e, Var):
        return e.name
    if isinstance(e, Lit):
        return repr(e.value)
    if isinstance(e, Func):
        if isinstance(e.arg, list):
            inner = ", ".join(expr_text(a) for a in e.arg)
        else:
            inner = "*" if e.arg is None else expr_text(e.arg)
        d = "DISTINCT " if e.distinct else ""
        return f"{e.name}({d}{inner})"
    if isinstance(e, BinOp):
        if e.op == "is_null":
            return f"{expr_text(e.left)} IS NULL"
        return f"{expr_text(e.left)} {e.op} {expr_text(e.right)}"
    if isinstance(e, Not):
        return f"NOT {expr_text(e.expr)}"
    if isinstance(e, Case):
        parts = ["CASE"]
        if e.operand is not None:
            parts.append(expr_text(e.operand))
        for w, th in e.whens:
            parts.append(f"WHEN {expr_text(w)} THEN {expr_text(th)}")
        if not (isinstance(e.default, Lit) and e.default.value is None):
            parts.append(f"ELSE {expr_text(e.default)}")
        parts.append("END")
        return " ".join(parts)
    return str(e)
