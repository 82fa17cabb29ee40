"""Recursive-descent parser for the AHGHEE query language
(grammar cloned semantically from ``src/cli-grammer/AHGHEE.g4``; the
reference binds the ANTLR parse tree straight to protobuf Step IR in
``src/parser/ContextExtensions.cs`` / ``Listener.cs`` — we parse straight
to ``ekati_spark.graph.ir``).

Supported commands:
    put [-flags] <node> (; <node>)*
    get [-flags] <nodeid> (, <nodeid>)* [|> pipecmd]*
    load (graphml|nt) "<path>"

pipecmds: follow (* | edge-tree) [a..b] · filter <compare> ·
          skip/offset N · limit/take N · fields <clude> ·
          transform "<plugin-name>" (user operator, ekati_spark/plugins)
"""

from __future__ import annotations

import re

from ekati_spark.graph import ir

_TOKEN_RE = re.compile(
    r"""
    (?P<ws>\s+)
  | (?P<comment>//[^\n]*|/\*.*?\*/)
  | (?P<string>"(?:\\.|[^"\\])*")
  | (?P<pipestart>\|>)
  | (?P<boolop>&&|\|\|)
  | (?P<mathop>==|<=|>=|!=|<|>)
  | (?P<number>-?(?:0|[1-9][0-9]*)(?:\.[0-9]+)?(?:[Ee][+-]?[0-9]+)?)
  | (?P<word>[A-Za-z]+[A-Za-z/0-9\#?&:.=]*)
  | (?P<punct>[{}\[\],:;^*()+\-.])
    """,
    re.VERBOSE | re.DOTALL,
)


class Token:
    __slots__ = ("kind", "text")

    def __init__(self, kind: str, text: str):
        self.kind = kind
        self.text = text

    def __repr__(self):
        return f"{self.kind}:{self.text!r}"


def tokenize(src: str) -> list[Token]:
    out, pos = [], 0
    while pos < len(src):
        m = _TOKEN_RE.match(src, pos)
        if not m:
            raise SyntaxError(f"bad token at {pos}: {src[pos:pos+20]!r}")
        pos = m.end()
        kind = m.lastgroup
        if kind in ("ws", "comment"):
            continue
        out.append(Token(kind, m.group()))
    return out


def _unquote(s: str) -> str:
    body = s[1:-1]
    return re.sub(
        r"\\(.)",
        lambda m: {"n": "\n", "t": "\t", "r": "\r", "b": "\b", "f": "\f"}.get(
            m.group(1), m.group(1)
        ),
        body,
    )


class Parser:
    def __init__(self, src: str):
        self.toks = tokenize(src)
        self.i = 0

    # -- token helpers ----------------------------------------------------

    def peek(self, k: int = 0) -> Token | None:
        j = self.i + k
        return self.toks[j] if j < len(self.toks) else None

    def next(self) -> Token:
        if self.i >= len(self.toks):
            raise SyntaxError("unexpected end of input")
        t = self.toks[self.i]
        self.i += 1
        return t

    def accept(self, text: str) -> bool:
        t = self.peek()
        if t and t.text == text:
            self.i += 1
            return True
        return False

    def expect(self, text: str) -> Token:
        t = self.next()
        if t.text != text:
            raise SyntaxError(f"expected {text!r}, got {t.text!r}")
        return t

    # -- entry ------------------------------------------------------------

    def parse(self):
        t = self.peek()
        if t is None:
            raise SyntaxError("empty input")
        if t.text == "put":
            out = self.put()
        elif t.text == "get":
            out = self.get()
        elif t.text == "load":
            out = self.load()
        else:
            raise SyntaxError(f"unknown command {t.text!r}")
        # reject trailing garbage — a valid prefix must not silently
        # swallow the rest (e.g. an unparenthesized compound filter)
        left = self.peek()
        if left is not None:
            raise SyntaxError(f"unexpected trailing input at {left.text!r}")
        return out

    def _flags(self) -> str:
        if self.peek() and self.peek().text == "-" and self.peek(1) and self.peek(1).kind == "word":
            self.next()
            return self.next().text
        return ""

    # -- get --------------------------------------------------------------

    def get(self) -> ir.GetQuery:
        self.expect("get")
        flags = self._flags()
        seeds = [self.nodeid()]
        while self.accept(","):
            seeds.append(self.nodeid())
        steps = []
        while self.accept("|>"):
            steps.append(self.pipecmd())
        return ir.GetQuery(
            seeds=tuple(seeds), steps=tuple(steps), history="h" in flags
        )

    def nodeid(self) -> ir.NodeRef:
        t = self.peek()
        if t.text == "{":  # obj form: {"id": ..., "remote": ...}
            obj = self.obj()
            return ir.NodeRef(
                iri=str(obj.get("id", obj.get("iri", ""))),
                remote=str(obj.get("remote", "")),
            )
        first = self.next()
        v1 = _unquote(first.text) if first.kind == "string" else first.text
        nxt = self.peek()
        if nxt and nxt.kind in ("word", "string") and first.kind in ("word", "string"):
            # remote id form
            second = self.next()
            v2 = _unquote(second.text) if second.kind == "string" else second.text
            return ir.NodeRef(iri=v2, remote=v1)
        return ir.NodeRef(iri=v1)

    def pipecmd(self):
        t = self.peek()
        if t.text == "follow":
            return self.follow()
        if t.text == "filter":
            return self.wherefilter()
        if t.text in ("skip", "offset"):
            self.next()
            return ir.SkipStep(int(self.next().text))
        if t.text in ("limit", "take"):
            self.next()
            return ir.LimitStep(int(self.next().text))
        if t.text == "fields":
            self.next()
            return ir.FieldsStep(cludes=tuple(self.clude_list()))
        if t.text == "transform":
            self.next()
            name = self.next()
            return ir.TransformStep(
                _unquote(name.text) if name.kind == "string" else name.text
            )
        raise SyntaxError(f"unknown pipe command {t.text!r}")

    # -- follow -----------------------------------------------------------

    def follow(self) -> ir.FollowStep:
        self.expect("follow")
        if self.accept("*"):
            frm, to = self.range_or_default()
            return ir.FollowStep(ir.Any(frm, to))
        return ir.FollowStep(self.edgenum())

    def range_or_default(self) -> tuple[int, int]:
        """range: (from '..')? to — absent range defaults to 1..1."""
        t = self.peek()
        if t and t.kind == "number":
            first = int(self.next().text)
            if self.peek() and self.peek().text == "." and self.peek(1) and self.peek(1).text == ".":
                self.next(), self.next()
                to = int(self.next().text)
                return first, to
            # Bare NUMBER = "up to N hops": the reference binds it as
            # Range{From=0, To=N} (ContextExtensions.cs:291-298, the
            # optional `from` defaults to "0"), and every reached node is
            # emitted; we emit hops 1..N — the seed is the hop-0 node the
            # caller already has (documented deviation; the reference's
            # unconditional self-append re-emits seeds, FileStore.fs:381).
            return 1, first
        return 1, 1

    def edgenum(self):
        if self.accept("("):
            node = self.edgenum()
            while self.peek() and self.peek().kind == "boolop":
                op = self.next().text
                right = self.edgenum()
                node = ir.And(node, right) if op == "&&" else ir.Or(node, right)
            self.expect(")")
            # optional trailing range applies only to leaf forms in the
            # grammar; compound keeps children's ranges
            return node
        t = self.next()
        label = _unquote(t.text) if t.kind == "string" else t.text
        frm, to = self.range_or_default()
        return ir.Edge(label, frm, to)

    # -- filter -----------------------------------------------------------

    def wherefilter(self) -> ir.FilterStep:
        self.expect("filter")
        return ir.FilterStep(self.compare())

    def compare(self):
        if self.accept("("):
            left = self.compare()
            t = self.peek()
            if t and t.kind == "boolop":
                op = self.next().text
                right = self.compare()
                self.expect(")")
                return ir.Compound(left, op, right)
            self.expect(")")
            return left
        key = self.value_literal()
        op = self.next()
        if op.kind != "mathop":
            raise SyntaxError(f"expected comparison op, got {op.text!r}")
        val = self.value_literal()
        return ir.KeyValueCmp(str(key), op.text, val)

    # -- fields clude -----------------------------------------------------

    def clude_list(self) -> list:
        if self.accept("("):
            items = [self.clude()]
            while self.accept(","):
                items.append(self.clude())
            self.expect(")")
            return items
        return [self.clude()]

    def clude(self):
        if self.accept("-"):
            return ir.Exclude(tuple(self.clude_list()))
        if self.accept("+"):
            return ir.Include(tuple(self.clude_list()))
        if self.peek() and self.peek().text == "(":
            return tuple(self.clude_list())
        return self.cludeop()

    def cludeop(self) -> ir.CludeOp:
        key = self.cludepart()
        self.expect(":")
        val = self.cludepart()
        return ir.CludeOp(key, val)

    def cludepart(self) -> ir.CludePart:
        t = self.next()
        if t.text == "^":
            nxt = self.peek()
            if nxt and nxt.kind == "string":
                return ir.CludePart("caret_target", _unquote(self.next().text))
            return ir.CludePart("caret")
        if t.text == "*":
            return ir.CludePart("star")
        if t.kind == "string":
            text = _unquote(t.text)
            # quoted "*" is the wildcard matcher, same as bare *
            if text == "*":
                return ir.CludePart("star")
            return ir.CludePart("lit", text)
        if t.text in ("int", "string", "float"):
            return ir.CludePart("type", t.text)
        raise SyntaxError(f"bad cludepart {t.text!r}")

    # -- put --------------------------------------------------------------

    def put(self) -> ir.PutCommand:
        self.expect("put")
        self._flags()
        nodes = [self.put_node()]
        while self.accept(";"):
            nodes.append(self.put_node())
        return ir.PutCommand(tuple(nodes))

    def put_node(self) -> ir.PutNode:
        t = self.peek()
        if t.text == "{":
            pairs = self.obj_pairs()
            # obj form: identity comes from "id"/"remote" kvps (matching
            # the nodeid() obj form used by get)
            def _take(key):
                return next(
                    (
                        p.value
                        for p in pairs
                        if p.kind == ir.PairKind.KVP and p.key == key
                    ),
                    "",
                )

            iri, remote = _take("id"), _take("remote")
            rest = tuple(
                p
                for p in pairs
                if not (p.kind == ir.PairKind.KVP and p.key in ("id", "remote"))
            )
            return ir.PutNode(ir.NodeRef(str(iri), remote=str(remote)), rest)
        ref = self.nodeid()
        pairs = self.obj_pairs() if self.peek() and self.peek().text == "{" else self.kvps()
        return ir.PutNode(ref, tuple(pairs))

    def obj(self) -> dict:
        pairs = self.obj_pairs()
        return {
            p.key: p.value for p in pairs if p.kind == ir.PairKind.KVP
        }

    def obj_pairs(self) -> list[ir.PutPair]:
        self.expect("{")
        if self.accept("}"):
            return []
        pairs = self.kvps()
        self.expect("}")
        return pairs

    def kvps(self) -> list[ir.PutPair]:
        pairs = [self.pair()]
        while self.accept(","):
            pairs.append(self.pair())
        return pairs

    def pair(self) -> ir.PutPair:
        """Four pair shapes (AHGHEE.g4:53-74): kvp, edge, fedge, dedge."""
        if self.accept("^"):
            key = _unquote(self.next().text)
            self.expect(":")
            if self.accept("^"):
                target = _unquote(self.next().text)
                return ir.PutPair(ir.PairKind.DEDGE, key, ir.NodeRef(target))
            return ir.PutPair(ir.PairKind.FEDGE, key, self.value_literal())
        key_tok = self.next()
        key = _unquote(key_tok.text) if key_tok.kind == "string" else key_tok.text
        self.expect(":")
        if self.accept("^"):
            target = _unquote(self.next().text)
            return ir.PutPair(ir.PairKind.EDGE, key, ir.NodeRef(target))
        return ir.PutPair(ir.PairKind.KVP, key, self.value_literal())

    def value_literal(self):
        """JSON-ish value; numbers follow the reference's i32→i64→f policy
        simplified to int-if-integral else float
        (ContextExtensions.cs:194-213)."""
        t = self.next()
        if t.kind == "string":
            return _unquote(t.text)
        if t.kind == "number":
            return float(t.text) if ("." in t.text or "e" in t.text.lower()) else int(t.text)
        if t.text == "true":
            return True
        if t.text == "false":
            return False
        if t.text == "null":
            return None
        if t.text == "{":
            self.i -= 1
            return self.obj()
        if t.text == "[":
            arr = []
            if self.accept("]"):
                return arr
            arr.append(self.value_literal())
            while self.accept(","):
                arr.append(self.value_literal())
            self.expect("]")
            return arr
        raise SyntaxError(f"bad value {t.text!r}")

    # -- load -------------------------------------------------------------

    def load(self) -> ir.LoadCommand:
        self.expect("load")
        kind = self.next().text
        path = _unquote(self.next().text)
        return ir.LoadCommand(kind, path)


def parse(src: str):
    """Parse one AHGHEE command → IR."""
    return Parser(src).parse()
