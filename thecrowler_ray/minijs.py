"""A deterministic JavaScript-subset interpreter for ruleset plugins.

The reference embeds a full JS VM (otto) for plugin scripts
(``pkg/plugin/plugins.go``; contract: the VM gets ``params`` set
(``plugins.go:983``), runs the script, and the result is the conventional
``var result = …`` export, else the script's final expression value
(``plugins.go:2265-2299``)). Shipping a complete VM is out of scope, but a
large share of real scraping plugins are plain data transforms — so this
module implements an honest SUBSET interpreter (tokenizer → recursive
descent parser → tree-walking evaluator) sufficient for those:

  - literals (numbers incl. hex/exponent, strings, booleans, null,
    arrays, objects, regex literals with g/i/m flags)
  - var/let/const, assignment (+=, -=, *=, /=), ++/--
  - if/else, while, do/while, for(;;), for..in (objects/arrays/strings),
    switch/case/default with fall-through, break, continue, blocks,
    return, labeled statements (``outer: for … break outer``)
  - try/catch/finally + throw (thrown values are catchable; native
    runtime errors surface as catchable {name, message} objects; the op
    budget is NOT catchable)
  - function declarations + function expressions (closures),
    ``arguments``, fn.call/fn.apply/fn.bind,
    Object.defineProperty/create/keys/getOwnPropertyNames
  - object-literal accessors (``{ get x() {…}, set x(v) {…} }``) —
    property reads/writes/JSON.stringify route through them
  - operators: + - * / % comparisons && || ! ?: instanceof in void
    and the comma operator; ===/!== are strict and ==/!= follow ES5
    abstract equality (null == undefined, number/string/boolean
    coercion, objects via the engine's string conversion)
  - Math.*, JSON.parse/stringify, String()/String.fromCharCode,
    Number(), parseInt (with radix)/parseFloat, isNaN/isFinite,
    Object.keys, Object.prototype.hasOwnProperty/toString,
    Array.isArray, Array.prototype.* (unbound, for .apply patterns)
  - RegExp: literals, new RegExp(p, f), test/exec/lastIndex/source,
    String.replace(regex, s)/match/split(regex) — translated to Python
    ``re`` (JS and Python syntax agree on this subset; patterns outside
    it fail loudly at construction)
  - string methods (toLowerCase/toUpperCase/trim/split/indexOf/includes/
    slice/substring/replace/startsWith/endsWith/charAt/charCodeAt/
    repeat), array methods (push/pop/shift/unshift/join/indexOf/
    lastIndexOf/includes/slice/concat/map/filter/forEach/reduce/some/
    every/sort/reverse), number.toFixed, .length

Execution is bounded (``max_ops``) and has no I/O, imports, eval, or
host access — scripts are pure functions of ``params``, which is exactly
what the data plane needs. Anything outside the subset raises
``MiniJsError`` at parse time, so unsupported plugins fail loudly rather
than mis-run. This subset runs the reference's own plugin corpus
verbatim: ``plugins/lib/json_query.js`` (1,075 lines),
``plugins/lib/math_utils.js`` + its test file, and the infoseed
candidate processors (see tests/test_minijs.py).
"""

from __future__ import annotations

import json
import math
import re as _re
import urllib.parse


class MiniJsError(Exception):
    pass


class MiniJsBudgetError(MiniJsError):
    """Op budget exceeded — deliberately NOT catchable by script code."""


class _Undefined:
    _inst = None

    def __new__(cls):
        if cls._inst is None:
            cls._inst = super().__new__(cls)
        return cls._inst

    def __repr__(self):
        return "undefined"


UNDEFINED = _Undefined()


class _HoleType:
    """An array HOLE (elision / length-grow): reads as undefined but is
    absent for `in`, iteration methods and JSON key counts (ES5
    15.4)."""

    _inst = None

    def __new__(cls):
        if cls._inst is None:
            cls._inst = super().__new__(cls)
        return cls._inst

    def __repr__(self):
        return "<hole>"


HOLE = _HoleType()


def _unhole(v):
    return UNDEFINED if v is HOLE else v

_PUNCT = [
    ">>>=", "===", "!==", ">>>", "<<=", ">>=", "&&", "||", "==", "!=",
    "<=", ">=", "+=", "-=", "*=", "/=", "%=", "&=", "|=", "^=", "++",
    "--", "<<", ">>", "{", "}", "(", ")", "[", "]", ",", ";", ":", "?",
    ".", "+", "-", "*", "/", "%", "<", ">", "=", "!", "&", "|", "^", "~",
]
_KEYWORDS = {
    "var", "let", "const", "if", "else", "while", "for", "return",
    "function", "true", "false", "null", "undefined", "typeof", "throw",
    "new", "do", "break", "continue", "try", "catch", "finally",
    "instanceof", "delete", "in", "switch", "case", "default", "void",
    "with",
}

# a `/` starts a regex literal (not division) when the previous
# significant token cannot end an expression
_REGEX_PREV_KW = {"return", "typeof", "throw", "new", "else", "do",
                  "instanceof"}


def _regex_ok(toks: list[tuple[str, object]]) -> bool:
    if not toks:
        return True
    kind, val = toks[-1]
    if kind == "punct":
        return val not in (")", "]", "++", "--")
    if kind == "kw":
        return val in _REGEX_PREV_KW
    return False  # id / num / str / regex end an expression


def _tokenize(src: str) -> list[tuple[str, object]]:
    toks: list[tuple[str, object]] = []
    i, n = 0, len(src)
    while i < n:
        c = src[i]
        if c in " \t\r\n":
            i += 1
            continue
        if src.startswith("//", i):
            j = src.find("\n", i)
            i = n if j < 0 else j + 1
            continue
        if src.startswith("/*", i):
            j = src.find("*/", i + 2)
            if j < 0:
                raise MiniJsError("unterminated comment")
            i = j + 2
            continue
        if c == "/" and _regex_ok(toks):
            j = i + 1
            in_class = False
            while j < n:
                ch = src[j]
                if ch == "\\":
                    j += 2
                    continue
                if ch == "[":
                    in_class = True
                elif ch == "]":
                    in_class = False
                elif ch == "/" and not in_class:
                    break
                elif ch == "\n":
                    raise MiniJsError("unterminated regex literal")
                j += 1
            if j >= n:
                raise MiniJsError("unterminated regex literal")
            pattern = src[i + 1 : j]
            j += 1
            k = j
            while k < n and src[k].isalpha():
                k += 1
            toks.append(("regex", (pattern, src[j:k])))
            i = k
            continue
        if src.startswith("0x", i) or src.startswith("0X", i):
            j = i + 2
            while j < n and src[j] in "0123456789abcdefABCDEF":
                j += 1
            toks.append(("num", float(int(src[i + 2 : j], 16))))
            i = j
            continue
        if c.isdigit() or (c == "." and i + 1 < n and src[i + 1].isdigit()):
            j = i
            while j < n and (src[j].isdigit() or src[j] == "."):
                j += 1
            if j < n and src[j] in "eE":
                k = j + 1
                if k < n and src[k] in "+-":
                    k += 1
                if k < n and src[k].isdigit():
                    while k < n and src[k].isdigit():
                        k += 1
                    j = k
            toks.append(("num", float(src[i:j])))
            i = j
            continue
        if c in "'\"":
            j = i + 1
            out = []
            while j < n and src[j] != c:
                if src[j] == "\\" and j + 1 < n:
                    esc = src[j + 1]
                    if esc in "xu":  # \xHH / \uHHHH — hex REQUIRED
                        w = 2 if esc == "x" else 4
                        hexs = src[j + 2:j + 2 + w]
                        if len(hexs) != w or any(
                                c not in "0123456789abcdefABCDEF"
                                for c in hexs):
                            raise MiniJsError(
                                f"invalid \\{esc} escape in string")
                        out.append(chr(int(hexs, 16)))
                        j += 2 + w
                        continue
                    out.append({"n": "\n", "t": "\t", "r": "\r", "b": "\b",
                                "f": "\f", "v": "\v", "0": "\0"}.get(esc, esc))
                    j += 2
                else:
                    out.append(src[j])
                    j += 1
            if j >= n:
                raise MiniJsError("unterminated string")
            toks.append(("str", "".join(out)))
            i = j + 1
            continue
        if c.isalpha() or c in "_$":
            j = i
            while j < n and (src[j].isalnum() or src[j] in "_$"):
                j += 1
            word = src[i:j]
            toks.append(("kw" if word in _KEYWORDS else "id", word))
            i = j
            continue
        for p in _PUNCT:
            if src.startswith(p, i):
                toks.append(("punct", p))
                i += len(p)
                break
        else:
            raise MiniJsError(f"unexpected character {c!r}")
    toks.append(("eof", None))
    return toks


class _Parser:
    def __init__(self, toks):
        self.toks = toks
        self.i = 0

    def peek(self, k=0):
        return self.toks[min(self.i + k, len(self.toks) - 1)]

    def next(self):
        t = self.toks[self.i]
        self.i += 1
        return t

    def eat(self, kind, val=None):
        t = self.next()
        if t[0] != kind or (val is not None and t[1] != val):
            raise MiniJsError(f"expected {val or kind}, got {t[1]!r}")
        return t

    def at(self, kind, val=None):
        t = self.peek()
        return t[0] == kind and (val is None or t[1] == val)

    def skip_semi(self):
        while self.at("punct", ";"):
            self.next()

    # -- statements --------------------------------------------------------
    def program(self):
        body = []
        while not self.at("eof"):
            body.append(self.statement())
            self.skip_semi()
        return ("block", body)

    def statement(self):
        if self.at("punct", ";"):  # empty statement (ES5 12.3)
            self.next()
            return ("block", [])
        if self.at("punct", "{"):
            self.next()
            body = []
            while not self.at("punct", "}"):
                body.append(self.statement())
                self.skip_semi()
            self.eat("punct", "}")
            return ("block", body)
        if self.at("kw", "var") or self.at("kw", "let") or self.at("kw", "const"):
            self.next()
            decls = []
            while True:
                name = self.eat("id")[1]
                # None marks a bare declarator: `var x;` must NOT reset
                # an existing binding (ES5 10.5 / 12.2 — re-declaring a
                # parameter or prior var leaves its value intact)
                init = None
                if self.at("punct", "="):
                    self.next()
                    # AssignmentExpression, NOT Expression: the comma
                    # separates declarators (ES5 12.2)
                    init = self.assignment()
                decls.append((name, init))
                if self.at("punct", ","):
                    self.next()
                    continue
                break
            return ("decl", decls)
        if self.at("kw", "if"):
            self.next()
            self.eat("punct", "(")
            cond = self.expr()
            self.eat("punct", ")")
            then = self.statement()
            other = None
            self.skip_semi()
            if self.at("kw", "else"):
                self.next()
                other = self.statement()
            return ("if", cond, then, other)
        if self.at("kw", "while"):
            self.next()
            self.eat("punct", "(")
            cond = self.expr()
            self.eat("punct", ")")
            return ("while", cond, self.statement())
        if self.at("kw", "with"):
            # ES5 12.10: the object joins the front of the scope chain
            self.next()
            self.eat("punct", "(")
            obj = self.expr()
            self.eat("punct", ")")
            return ("with", obj, self.statement())
        if self.at("kw", "do"):
            self.next()
            body = self.statement()
            self.skip_semi()
            self.eat("kw", "while")
            self.eat("punct", "(")
            cond = self.expr()
            self.eat("punct", ")")
            return ("dowhile", cond, body)
        if self.at("kw", "break"):
            self.next()
            label = self.next()[1] if self.at("id") else None
            return ("break", label)
        if self.at("kw", "continue"):
            self.next()
            label = self.next()[1] if self.at("id") else None
            return ("continue", label)
        if self.at("kw", "try"):
            self.next()
            block = self.statement()
            catch_name, catch_block, fin = None, None, None
            if self.at("kw", "catch"):
                self.next()
                self.eat("punct", "(")
                catch_name = self.eat("id")[1]
                self.eat("punct", ")")
                catch_block = self.statement()
            if self.at("kw", "finally"):
                self.next()
                fin = self.statement()
            if catch_block is None and fin is None:
                raise MiniJsError("try without catch/finally")
            return ("try", block, catch_name, catch_block, fin)
        if self.at("kw", "for"):
            self.next()
            self.eat("punct", "(")
            # for-in forms (ES5 12.6.4): for (x in e) / for (var x in e)
            if (self.at("kw", "var") or self.at("kw", "let")
                    or self.at("kw", "const")) \
                    and self.peek(1)[0] == "id" \
                    and self.peek(2) == ("kw", "in"):
                self.next()
                name = self.next()[1]
                self.next()
                obj = self.expr()
                self.eat("punct", ")")
                return ("forin", name, obj, self.statement(), True)
            if self.at("id") and self.peek(1) == ("kw", "in"):
                name = self.next()[1]
                self.next()
                obj = self.expr()
                self.eat("punct", ")")
                return ("forin", name, obj, self.statement(), False)
            init = None
            if not self.at("punct", ";"):
                init = self.statement()
            self.eat("punct", ";")
            cond = None if self.at("punct", ";") else self.expr()
            self.eat("punct", ";")
            upd = None if self.at("punct", ")") else self.expr()
            self.eat("punct", ")")
            return ("for", init, cond, upd, self.statement())
        if self.at("kw", "switch"):
            self.next()
            self.eat("punct", "(")
            disc = self.expr()
            self.eat("punct", ")")
            self.eat("punct", "{")
            cases = []
            while not self.at("punct", "}"):
                if self.at("kw", "case"):
                    self.next()
                    test = self.expr()
                    self.eat("punct", ":")
                elif self.at("kw", "default"):
                    self.next()
                    self.eat("punct", ":")
                    test = None
                else:
                    raise MiniJsError("expected case/default in switch")
                body = []
                while not (self.at("kw", "case") or self.at("kw", "default")
                           or self.at("punct", "}")):
                    body.append(self.statement())
                    self.skip_semi()
                cases.append((test, body))
            self.eat("punct", "}")
            return ("switch", disc, cases)
        if self.at("kw", "throw"):
            self.next()
            return ("throw", self.expr())
        if self.at("kw", "return"):
            self.next()
            if self.at("punct", ";") or self.at("punct", "}") or self.at("eof"):
                return ("return", ("lit", UNDEFINED))
            return ("return", self.expr())
        if self.at("kw", "function"):
            # FunctionDeclaration (ES5 13): distinct node so the
            # declaration-binding pass (ES5 10.5) can hoist it — a
            # `var f = function(){}` initializer must NOT hoist
            self.next()
            name = self.eat("id")[1]
            fn = self.function_rest()
            return ("fdecl", name, fn)
        if self.at("id") and self.peek(1) == ("punct", ":"):
            # labeled statement (ES5 12.12): label targets for the
            # enclosed loop's break/continue
            label = self.next()[1]
            self.next()
            return ("label", label, self.statement())
        return ("expr", self.expr())

    def function_rest(self):
        self.eat("punct", "(")
        names = []
        while not self.at("punct", ")"):
            names.append(self.eat("id")[1])
            if self.at("punct", ","):
                self.next()
        self.eat("punct", ")")
        self.eat("punct", "{")
        body = []
        while not self.at("punct", "}"):
            body.append(self.statement())
            self.skip_semi()
        self.eat("punct", "}")
        return ("func", names, ("block", body))

    # -- expressions (precedence climbing) ---------------------------------
    def expr(self):
        node = self.assignment()
        while self.at("punct", ","):  # comma operator (ES5 11.14)
            self.next()
            node = ("seq", node, self.assignment())
        return node

    def assignment(self):
        left = self.ternary()
        if self.at("punct", "=") or any(
            self.at("punct", op)
            for op in ("+=", "-=", "*=", "/=", "%=", "&=", "|=", "^=",
                       "<<=", ">>=", ">>>=")
        ):
            op = self.next()[1]
            right = self.assignment()
            if left[0] not in ("name", "member", "index"):
                raise MiniJsError("invalid assignment target")
            return ("assign", op, left, right)
        return left

    def ternary(self):
        cond = self.logic_or()
        if self.at("punct", "?"):
            self.next()
            a = self.assignment()
            self.eat("punct", ":")
            b = self.assignment()
            return ("ternary", cond, a, b)
        return cond

    def _binary(self, sub, ops):
        node = sub()
        while any(self.at("punct", o) for o in ops):
            op = self.next()[1]
            node = ("bin", op, node, sub())
        return node

    def logic_or(self):
        return self._binary(self.logic_and, ("||",))

    def logic_and(self):
        return self._binary(self.bit_or, ("&&",))

    def bit_or(self):
        return self._binary(self.bit_xor, ("|",))

    def bit_xor(self):
        return self._binary(self.bit_and, ("^",))

    def bit_and(self):
        return self._binary(self.equality, ("&",))

    def equality(self):
        return self._binary(self.relational, ("===", "!==", "==", "!="))

    def relational(self):
        node = self.shift()
        while True:
            if any(self.at("punct", o) for o in ("<", "<=", ">", ">=")):
                op = self.next()[1]
                node = ("bin", op, node, self.shift())
            elif self.at("kw", "instanceof"):
                self.next()
                node = ("bin", "instanceof", node, self.shift())
            elif self.at("kw", "in"):
                self.next()
                node = ("bin", "in", node, self.shift())
            else:
                return node

    def shift(self):
        return self._binary(self.additive, ("<<", ">>", ">>>"))

    def additive(self):
        return self._binary(self.multiplicative, ("+", "-"))

    def multiplicative(self):
        return self._binary(self.unary, ("*", "/", "%"))

    def unary(self):
        if self.at("punct", "!"):
            self.next()
            return ("not", self.unary())
        if self.at("punct", "~"):
            self.next()
            return ("bitnot", self.unary())
        if self.at("punct", "-"):
            self.next()
            return ("neg", self.unary())
        if self.at("punct", "+"):
            self.next()
            return ("pos", self.unary())
        if self.at("punct", "++") or self.at("punct", "--"):
            op = self.next()[1]
            return ("preincr", op, self.unary())
        if self.at("kw", "typeof"):
            self.next()
            return ("typeof", self.unary())
        if self.at("kw", "void"):
            self.next()
            return ("void", self.unary())
        if self.at("kw", "delete"):
            self.next()
            target = self.unary()
            if target[0] not in ("member", "index", "name"):
                raise MiniJsError("delete requires a property reference")
            return ("delete", target)
        if self.at("kw", "new"):
            self.next()
            ctor = self.primary()
            while self.at("punct", "."):  # new a.b.C(...)
                self.next()
                t = self.next()
                if t[0] not in ("id", "kw"):
                    raise MiniJsError("bad member name")
                ctor = ("member", ctor, t[1])
            args = []
            if self.at("punct", "("):
                self.next()
                while not self.at("punct", ")"):
                    args.append(self.assignment())
                    if self.at("punct", ","):
                        self.next()
                self.eat("punct", ")")
            # (new C(...)).member chains continue through postfix
            return self.postfix(("new", ctor, args))
        return self.postfix()

    def postfix(self, start=None):
        node = self.primary() if start is None else start
        while True:
            if self.at("punct", "."):
                self.next()
                t = self.next()
                if t[0] not in ("id", "kw"):
                    raise MiniJsError("bad member name")
                node = ("member", node, t[1])
            elif self.at("punct", "["):
                self.next()
                idx = self.expr()
                self.eat("punct", "]")
                node = ("index", node, idx)
            elif self.at("punct", "("):
                self.next()
                args = []
                while not self.at("punct", ")"):
                    args.append(self.assignment())
                    if self.at("punct", ","):
                        self.next()
                self.eat("punct", ")")
                node = ("call", node, args)
            elif self.at("punct", "++") or self.at("punct", "--"):
                op = self.next()[1]
                node = ("postincr", op, node)
            else:
                return node

    def primary(self):
        t = self.peek()
        if t[0] == "num" or t[0] == "str":
            self.next()
            return ("lit", t[1])
        if t[0] == "regex":
            self.next()
            return ("regexlit", t[1][0], t[1][1])
        if t[0] == "kw":
            if t[1] in ("true", "false"):
                self.next()
                return ("lit", t[1] == "true")
            if t[1] == "null":
                self.next()
                return ("lit", None)
            if t[1] == "undefined":
                self.next()
                return ("lit", UNDEFINED)
            if t[1] == "function":
                self.next()
                if self.at("id"):
                    # named function expression (ES5 13): the name is
                    # visible only inside the function's own scope
                    name = self.next()[1]
                    return ("namedfunc", name, self.function_rest())
                return self.function_rest()
        if t[0] == "id":
            self.next()
            return ("name", t[1])
        if self.at("punct", "("):
            self.next()
            e = self.expr()
            self.eat("punct", ")")
            return e
        if self.at("punct", "["):
            self.next()
            items = []
            while not self.at("punct", "]"):
                if self.at("punct", ","):
                    # elision (ES5 11.1.4): a real HOLE — reads as
                    # undefined, skipped by iteration methods and `in`
                    items.append(("lit", HOLE))
                    self.next()
                    continue
                items.append(self.assignment())
                if self.at("punct", ","):
                    self.next()
            self.eat("punct", "]")
            return ("array", items)
        if self.at("punct", "{"):
            self.next()
            pairs = []
            while not self.at("punct", "}"):
                k = self.next()
                if k[0] not in ("id", "str", "kw", "num"):
                    raise MiniJsError("bad object key")
                if (k[0] == "id" and k[1] in ("get", "set")
                        and not self.at("punct", ":")):
                    # accessor property: get key() { … } / set key(v) { … }
                    kk = self.next()
                    if kk[0] not in ("id", "str", "kw", "num"):
                        raise MiniJsError("bad accessor key")
                    key = str(int(kk[1])) if kk[0] == "num" \
                        and float(kk[1]).is_integer() else str(kk[1])
                    pairs.append((key, ("accessor", k[1],
                                        self.function_rest())))
                    if self.at("punct", ","):
                        self.next()
                    continue
                key = str(int(k[1])) if k[0] == "num" and float(k[1]).is_integer() \
                    else str(k[1])
                self.eat("punct", ":")
                pairs.append((key, self.assignment()))
                if self.at("punct", ","):
                    self.next()
            self.eat("punct", "}")
            return ("object", pairs)
        raise MiniJsError(f"unexpected token {t[1]!r}")


class _Return(Exception):
    def __init__(self, value):
        self.value = value


class _Break(Exception):
    def __init__(self, label=None):
        self.label = label


class _Continue(Exception):
    def __init__(self, label=None):
        self.label = label


class _Thrown(Exception):
    """A JS ``throw`` in flight — carries the thrown value for catch."""

    def __init__(self, value):
        self.value = value


class _Function:
    def __init__(self, params, body, env):
        self.params = params
        self.body = body
        self.env = env
        self.props: dict = {}  # function-object properties (.prototype, …)

    def prototype(self) -> dict:
        proto = self.props.get("prototype")
        if not isinstance(proto, dict):
            proto = _JsObject()
            self.props["prototype"] = proto
        return proto


class _JsObject(dict):
    """A plain JS object carrying a [[Prototype]] link outside its own
    keys (so Object.keys / for..in / JSON never see it).
    ``null_proto`` marks ``Object.create(null)`` objects: member reads
    must NOT fall through to the Object.prototype builtins."""

    __slots__ = ("proto", "null_proto")

    def __init__(self, *a, proto=None, null_proto=False, **kw):
        super().__init__(*a, **kw)
        self.proto = proto
        self.null_proto = null_proto


def _proto_lookup(obj, name: str):
    """Own property, else walk the prototype chain. → (value, found)."""
    if name in obj:
        return obj[name], True
    p = getattr(obj, "proto", None)
    while isinstance(p, dict):
        if name in p:
            return p[name], True
        p = getattr(p, "proto", None)
    return UNDEFINED, False


class _Accessor:
    """An ES5 get/set property (object-literal accessor syntax). The
    owner/interp backrefs let JSON.stringify and string conversion
    resolve the getter like real JS property reads."""

    __slots__ = ("getter", "setter", "owner", "interp")

    def __init__(self):
        self.getter = None
        self.setter = None
        self.owner = None
        self.interp = None

    def read(self, interp, this):
        if self.getter is None:
            return UNDEFINED
        return interp._invoke(self.getter, [], this_val=this)

    def write(self, interp, this, value):
        if self.setter is not None:  # no setter → silent no-op (ES5 sloppy)
            interp._invoke(self.setter, [value], this_val=this)

    def js_json(self):
        return _json_ready(self.read(self.interp, self.owner))


class _NativeThis:
    """A this-aware native (Object.prototype.* / Array.prototype.*):
    ``fn(interp, this, args)``; supports .call/.apply like JS."""

    def __init__(self, fn):
        self.fn = fn


class _Callable:
    """A callable builtin that also carries properties (String has
    fromCharCode; RegExp is a constructor name for instanceof)."""

    def __init__(self, fn, props=None, name=""):
        self.fn = fn
        self.props = props or {}
        self.name = name


_RE_CACHE: dict[tuple[str, str], "_re.Pattern"] = {}


def _js_rx_to_py(p: str) -> str:
    """Translate JS regex syntax Python's re lacks (the rest is
    shared): ``[^]``/``[]`` classes, ``\cX`` control escapes, Annex B
    octal escapes (``\52`` is ``*`` when no group 52 exists), and JS
    ``.`` (which also excludes \r/\u2028/\u2029)."""
    n = len(p)
    # pass 1: count capturing groups (octal-vs-backref disambiguation)
    groups = 0
    i, in_class = 0, False
    while i < n:
        c = p[i]
        if c == "\\":
            i += 2
            continue
        if in_class:
            if c == "]":
                in_class = False
        elif c == "[":
            in_class = True
        elif c == "(" and not (i + 1 < n and p[i + 1] == "?"):
            groups += 1
        i += 1
    out = []
    i, in_class = 0, False
    while i < n:
        c = p[i]
        if c == "\\" and i + 1 < n:
            d = p[i + 1]
            if d == "c" and i + 2 < n and p[i + 2].isalpha():
                out.append("\\x%02x" % (ord(p[i + 2]) % 32))
                i += 3
                continue
            if d.isdigit() and d != "0":
                j = i + 1
                while j < n and p[j].isdigit():
                    j += 1
                digits = p[i + 1:j]
                if in_class or int(digits) > groups:
                    if all(ch in "01234567" for ch in digits) \
                            and int(digits, 8) <= 0xFF:
                        out.append("\\x%02x" % int(digits, 8))
                    else:  # \8 \9: identity escape (Annex B)
                        out.append(_re.escape(digits))
                else:
                    out.append("\\" + digits)
                i = j
                continue
            out.append(p[i:i + 2])
            i += 2
            continue
        if in_class:
            if c == "]":
                in_class = False
            out.append(c)
            i += 1
            continue
        if c == "[":
            if p.startswith("[^]", i):
                out.append("[\\s\\S]")  # JS 'match anything'
                i += 3
                continue
            if p.startswith("[]", i):
                out.append("(?!)")  # JS empty class never matches
                i += 2
                continue
            in_class = True
            out.append(c)
            i += 1
            continue
        if c == ".":
            # JS . excludes ALL LineTerminators (ES5 15.10.2.8)
            out.append("[^\\n\\r\\u2028\\u2029]")
            i += 1
            continue
        out.append(c)
        i += 1
    return "".join(out)


class _RegExp:
    def __init__(self, pattern: str, flags: str):
        self.source = pattern
        self.flags = "".join(sorted(set(flags)))
        for f in self.flags:
            if f not in "gim":
                raise _Thrown({"name": "SyntaxError",
                               "message": f"unsupported regex flag {f!r}"})
        key = (pattern, self.flags)
        rx = _RE_CACHE.get(key)
        if rx is None:
            pyflags = 0
            if "i" in self.flags:
                pyflags |= _re.IGNORECASE
            if "m" in self.flags:
                pyflags |= _re.MULTILINE
            try:
                rx = _re.compile(_js_rx_to_py(pattern), pyflags)
            except _re.error as exc:
                raise _Thrown({"name": "SyntaxError",
                               "message": f"Invalid regular expression: {exc}"})
            _RE_CACHE[key] = rx
        self.regex = rx
        self.last_index = 0.0

    @property
    def is_global(self) -> bool:
        return "g" in self.flags

    def test(self, s: str) -> bool:
        if self.is_global:
            m = self.regex.search(s, int(self.last_index))
            self.last_index = float(m.end()) if m else 0.0
            return m is not None
        return self.regex.search(s) is not None

    def exec(self, s: str):
        start = int(self.last_index) if self.is_global else 0
        m = self.regex.search(s, start)
        if m is None:
            if self.is_global:
                self.last_index = 0.0
            return None
        if self.is_global:
            self.last_index = float(m.end())
        out = _MatchArray([m.group(0)] + [
            (g if g is not None else UNDEFINED) for g in m.groups()
        ])
        out.index = float(m.start())
        out.input = s
        return out


class _MatchArray(list):
    """RegExp.exec result: an array carrying the .index/.input
    expando properties (ES5 15.10.6.2)."""

    index = -1.0
    input = ""


class _Arguments(list):
    """The arguments object: array-like with .callee bound to the
    executing function and non-strict param aliasing (ES5 10.6):
    ``arguments[i] = v`` writes through to the i-th declared
    parameter's binding, and param writes flow back (handled in
    ``_store``)."""

    callee = None
    env = None      # the call's local scope (set by _invoke)
    params = None   # declared parameter names

    def __setitem__(self, i, v):
        list.__setitem__(self, i, v)
        if (self.env is not None and isinstance(i, int)
                and self.params and 0 <= i < len(self.params)):
            self.env[self.params[i]] = v


def _to_int32(v) -> int:
    """JS ToInt32: truncate toward zero, wrap mod 2^32, signed."""
    f = _num(v)
    if math.isnan(f) or math.isinf(f):
        return 0
    return _as_i32(int(f) & 0xFFFFFFFF)


def _as_i32(u: int) -> int:
    u &= 0xFFFFFFFF
    return u - 0x100000000 if u >= 0x80000000 else u


def _truthy(v) -> bool:
    if v is UNDEFINED or v is None or v is False or v is HOLE:
        return False
    if isinstance(v, float):
        return v == v and v != 0.0  # NaN is falsy
    if isinstance(v, str):
        return v != ""
    return True


def _js_int(v) -> int:
    """ToInteger (ES5 9.4): NaN -> 0, ±∞ clamps to ±2^53 (every string/
    array index saturates there), else truncate toward zero."""
    f = _num(v)
    if math.isnan(f):
        return 0
    if math.isinf(f):
        return (1 << 53) if f > 0 else -(1 << 53)
    return int(f)


def _num(v) -> float:
    if isinstance(v, bool):
        return 1.0 if v else 0.0
    if isinstance(v, float):
        return v
    if isinstance(v, str):
        t = v.strip()
        if not t:
            return 0.0
        if _re.fullmatch(r"[+-]?Infinity", t):
            return -math.inf if t[0] == "-" else math.inf
        if _re.fullmatch(r"0[xX][0-9a-fA-F]+", t):
            return float(int(t, 16))
        # strict decimal literal only: Python's float() also accepts
        # 'inf'/'nan'/'_' forms that JS ToNumber rejects (ES5 9.3.1)
        if _re.fullmatch(r"[+-]?(\d+\.?\d*|\.\d+)([eE][+-]?\d+)?", t):
            return float(t)
        return math.nan
    if v is None:
        return 0.0
    if isinstance(v, list):
        # ToPrimitive(array, number) -> ToString (arrays have no
        # valueOf), then ToNumber (ES5 9.3)
        return _num(_to_str(v))
    if isinstance(v, dict):
        # ToNumber via valueOf for native-backed objects (Date): the
        # stored natives take (it, args) with it unused; user _Function
        # valueOf needs an interpreter, so it stays NaN here
        vf = v.get("valueOf")
        if callable(vf) and not isinstance(
                vf, (_Function, _Bound, _NativeThis, _Callable)):
            try:
                return float(vf(None, []))
            except Exception:
                return math.nan
    return math.nan


def _js_num_str(v: float) -> str:
    """ToString(Number) per ES5 9.8.1 from Python's shortest
    round-trip repr: plain digits up to 1e21, decimal forms down to
    1e-6, exponent notation beyond — matching JS output digit for
    digit (String(1.2345e20) pads zeros rather than expanding the
    exact binary value)."""
    if v == 0:
        return "0"  # String(-0) is '0'
    import decimal

    t = decimal.Decimal(repr(abs(v))).as_tuple()
    digits = list(t.digits)
    exp = t.exponent
    while digits and digits[-1] == 0:
        digits.pop()
        exp += 1
    sd = "".join(map(str, digits))
    k = len(sd)
    n = exp + k
    if k <= n <= 21:
        out = sd + "0" * (n - k)
    elif 0 < n <= 21:
        out = sd[:n] + "." + sd[n:]
    elif -6 < n <= 0:
        out = "0." + "0" * (-n) + sd
    else:
        e = n - 1
        mant = sd if k == 1 else sd[0] + "." + sd[1:]
        out = mant + ("e+%d" % e if e >= 0 else "e-%d" % -e)
    return ("-" if v < 0 else "") + out


def _to_str(v) -> str:
    if v is UNDEFINED or v is HOLE:
        return "undefined"
    if v is None:
        return "null"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if math.isinf(v):
            return "Infinity" if v > 0 else "-Infinity"
        return _js_num_str(v)
    if isinstance(v, str):
        return v
    if isinstance(v, list):
        # Array.prototype.toString === join(',') (ES5 15.4.4.2);
        # null/undefined elements render empty
        return ",".join("" if x is None or x is UNDEFINED or x is HOLE
                        else _to_str(x) for x in v)
    if isinstance(v, _RegExp):
        return "/" + v.source + "/" + v.flags
    if isinstance(v, dict):
        return "[object Object]"
    return _json_stringify(v)


def _is_fnlike(v) -> bool:
    return isinstance(v, (_Function, _Bound, _NativeThis, _Callable)) or (
        callable(v) and not isinstance(v, (dict, list)))


def _json_ready(v, _path=None):
    if v is UNDEFINED or v is HOLE:
        return None
    if isinstance(v, float) and not math.isfinite(v):
        return None  # NaN/±Infinity stringify as null (ES5 15.12.3)
    if hasattr(v, "js_json"):
        return v.js_json()
    if isinstance(v, float) and v.is_integer() and abs(v) < 1e15:
        return int(v)
    if isinstance(v, (list, dict)):
        # cycle detection along the CURRENT path (ES5 15.12.3 step 4:
        # a catchable TypeError, mirroring JS engines)
        if _path is None:
            _path = set()
        if id(v) in _path:
            raise _Thrown({"name": "TypeError",
                           "message": "Converting circular structure "
                                      "to JSON"})
        _path = _path | {id(v)}
    if isinstance(v, list):
        # unserializable array elements render null (ES5 15.12.3)
        return [None if _is_fnlike(x) else _json_ready(x, _path)
                for x in v]
    if isinstance(v, dict):
        # function-valued / undefined properties are skipped (15.12.3)
        return {k: _json_ready(x, _path) for k, x in v.items()
                if x is not UNDEFINED and not _is_fnlike(x)}
    return v


def _json_stringify(v) -> str:
    return json.dumps(_json_ready(v), separators=(",", ":"),
                      sort_keys=False, ensure_ascii=False)


def _json_stringify_full(it, a) -> str:
    """JSON.stringify with the replacer + space arguments (ES5
    15.12.3): an ARRAY replacer filters object keys; a FUNCTION
    replacer maps (key, value) pairs; space indents (number of spaces,
    capped at 10, or a literal indent string)."""
    v = a[0] if a else UNDEFINED
    replacer = a[1] if len(a) > 1 else None
    space = a[2] if len(a) > 2 else None

    def apply_tojson(x, depth=0):
        # ES5 15.12.3 step 2a: call toJSON() before the replacer
        if depth > 64:
            return x
        if isinstance(x, dict) and not isinstance(x, _Accessor):
            tj = x.get("toJSON") or x.get("toISOString")  # Date 15.9.5.44
            if tj is not None and (isinstance(tj, (_Function, _Bound))
                                   or callable(tj)):
                return it._invoke(tj, [], this_val=x)
            return {k: apply_tojson(x[k], depth + 1)
                    for k in _own_keys(x, it)}
        if isinstance(x, list):
            return [apply_tojson(y, depth + 1) for y in x]
        return x

    v = apply_tojson(v)

    if isinstance(replacer, list):
        keep = {_to_str(k) for k in replacer}

        def filt(x):
            if isinstance(x, dict):
                return {k: filt(y) for k, y in x.items() if k in keep}
            if isinstance(x, list):
                return [filt(y) for y in x]
            return x

        v = filt(v)
    elif replacer is not None and replacer is not UNDEFINED and (
            isinstance(replacer, (_Function, _Bound)) or callable(replacer)):
        def walk(key, val):
            val = it._invoke(replacer, [key, val])
            if isinstance(val, dict):
                return {k: walk(k, y) for k, y in val.items()}
            if isinstance(val, list):
                return [walk(_to_str(float(i)), y)
                        for i, y in enumerate(val)]
            return val

        v = walk("", v)

    if v is UNDEFINED or _is_fnlike(v):
        return UNDEFINED  # JSON.stringify(undefined|function) (15.12.3)
    ready = _json_ready(v)
    if space is None or space is UNDEFINED:
        return json.dumps(ready, separators=(",", ":"),
                          sort_keys=False, ensure_ascii=False)
    indent = (" " * min(10, max(0, _js_int((space))))
              if isinstance(space, (float, bool)) else _to_str(space)[:10])
    if not indent:
        return json.dumps(ready, separators=(",", ":"),
                          sort_keys=False, ensure_ascii=False)
    return json.dumps(ready, indent=indent, separators=(",", ": "),
                      sort_keys=False, ensure_ascii=False)


def _json_parse(s):
    def conv(x):
        if isinstance(x, bool) or x is None or isinstance(x, str):
            return x
        if isinstance(x, (int, float)):
            return float(x)
        if isinstance(x, list):
            return [conv(i) for i in x]
        if isinstance(x, dict):
            return {k: conv(val) for k, val in x.items()}
        return x

    return conv(json.loads(s))


def _json_parse_full(it, a):
    """JSON.parse with the reviver argument (ES5 15.12.2): bottom-up
    walk calling reviver(key, value); undefined return DELETES the
    property (objects) or leaves undefined (arrays)."""
    v = _json_parse(_to_str(a[0] if a else ""))
    reviver = a[1] if len(a) > 1 else None
    if reviver is None or reviver is UNDEFINED or not (
            isinstance(reviver, (_Function, _Bound)) or callable(reviver)):
        return v

    def walk(holder, key, val):
        if isinstance(val, dict):
            for k in list(val.keys()):
                nv = walk(val, k, val[k])
                if nv is UNDEFINED:
                    del val[k]
                else:
                    val[k] = nv
        elif isinstance(val, list):
            for i in range(len(val)):
                val[i] = walk(val, _to_str(float(i)), val[i])
        return it._invoke(reviver, [key, val], this_val=holder)

    return walk({"": v}, "", v)


class Interpreter:
    def __init__(self, max_ops: int = 500_000, now_ms: float = 0.0):
        self.max_ops = max_ops
        self.ops = 0
        # deterministic clock: the host injects "now" (the reference's VM
        # exposes the real clock; a data-plane plugin must be replayable,
        # so wall time is a parameter here, never an ambient read)
        self.now_ms = float(now_ms)
        # ES5 integrity levels (8.6.2): id -> (obj, level). Holding the
        # object keeps its id stable for the interpreter's lifetime.
        # Enforced on property set/add/delete and array index/length
        # writes; array MUTATOR METHODS (push/splice/...) are not
        # barriered — a documented subset.
        self._integrity: dict[int, tuple] = {}
        # non-enumerable own properties (ES5 8.6.1 [[Enumerable]]):
        # id -> (obj, set of keys), same holding discipline as above
        self._nonenum: dict[int, tuple] = {}

        # per-interpreter Function.prototype object (shared across
        # Interpreters it would be a cross-script leak channel)
        self._function_proto = _JsObject()
        # Math.random state: deterministic xorshift64* seeded from the
        # injected clock so identical runs replay identically
        self._rng_state = (int(now_ms) * 2654435761 + 0x9E3779B9) \
            & 0xFFFFFFFFFFFFFFFF or 0x2545F4914F6CDD1D
        # expando properties on arrays (id -> (list, props dict)):
        # arrays are objects (ES5 15.4), Python lists can't carry
        # attributes, so non-index keys live in this side table
        self._list_props: dict[int, tuple] = {}

    def _list_props_of(self, obj, create: bool = False):
        ent = self._list_props.get(id(obj))
        if ent is None or ent[0] is not obj:
            if not create:
                return None
            ent = (obj, {})
            self._list_props[id(obj)] = ent
        return ent[1]

    def _next_random(self) -> float:
        x = self._rng_state
        x ^= (x << 13) & 0xFFFFFFFFFFFFFFFF
        x ^= x >> 7
        x ^= (x << 17) & 0xFFFFFFFFFFFFFFFF
        self._rng_state = x
        return ((x * 0x2545F4914F6CDD1D) & 0xFFFFFFFFFFFFFFFF) / 2.0**64

    def _mark_nonenum(self, obj, key: str):
        ent = self._nonenum.get(id(obj))
        if ent is None or ent[0] is not obj:
            ent = (obj, set())
            self._nonenum[id(obj)] = ent
        ent[1].add(key)

    def _nonenum_of(self, obj):
        ent = self._nonenum.get(id(obj))
        return ent[1] if ent is not None and ent[0] is obj else ()

    def _set_integrity(self, obj, level: str):
        if isinstance(obj, (dict, list)):
            cur = self._integrity.get(id(obj))
            rank = {"prevent": 0, "seal": 1, "freeze": 2}
            if cur is None or rank[cur[1]] < rank[level]:
                self._integrity[id(obj)] = (obj, level)
        return obj

    def _integrity_of(self, obj) -> str | None:
        e = self._integrity.get(id(obj))
        return e[1] if e is not None and e[0] is obj else None

    def run(self, src: str, params: dict | None = None,
            extra_vars: dict | None = None,
            host_vars: dict | None = None):
        """Execute a script. → the ``result`` global if set (non-null),
        else the last expression-statement value (the reference's export
        convention, plugins.go:2265-2299). ``extra_vars`` binds additional
        globals (the agent engine uses it for ``$``-prefixed step inputs);
        ``host_vars`` binds live host objects AS-IS (no JSON round-trip) —
        the DOM seam uses it for ``document``."""
        ast = _Parser(_tokenize(src)).program()
        env = {"params": _json_parse(json.dumps(params or {}))}
        # the root scope doubles as the global object (non-strict
        # `this` in plain calls, ES5 10.4.3)
        self.global_env = env
        env["this"] = env
        for k, v in (extra_vars or {}).items():
            env[k] = _json_parse(json.dumps(v, default=str))
        for k, v in (host_vars or {}).items():
            env[k] = v
        self.ops = 0
        last = UNDEFINED
        try:
            self._hoist(ast[1], env)
            for stmt in ast[1]:
                last = self.exec_stmt(stmt, env)
        except _Thrown as t:
            value = t.value
            msg = value.get("message", _to_str(value)) \
                if isinstance(value, dict) else _to_str(value)
            raise MiniJsError(f"script threw: {msg}")
        result = env.get("result", UNDEFINED)
        try:
            if result is not UNDEFINED and result is not None:
                return _json_ready(result)
            return _json_ready(last)
        except _Thrown:
            raise MiniJsError("script returned a circular structure")

    def _tick(self):
        self.ops += 1
        if self.ops > self.max_ops:
            raise MiniJsBudgetError("script exceeded op budget")

    # -- declaration binding (ES5 10.5) -------------------------------------
    def _hoist(self, stmts, env):
        """Bind function declarations and enter var names as undefined
        BEFORE the scope's statements run; recursion stops at nested
        function bodies (they hoist at their own invocation)."""
        for s in stmts:
            k = s[0]
            if k == "fdecl":
                env[s[1]] = _Function(s[2][1], s[2][2], env)
            elif k == "decl":
                for name, _init in s[1]:
                    if name not in env:
                        env[name] = UNDEFINED
            elif k == "block":
                self._hoist(s[1], env)
            elif k == "if":
                self._hoist([s[2]], env)
                if s[3] is not None:
                    self._hoist([s[3]], env)
            elif k in ("while", "dowhile", "with"):
                self._hoist([s[2]], env)
            elif k == "for":
                if s[1] is not None:
                    self._hoist([s[1]], env)
                self._hoist([s[4]], env)
            elif k == "forin":
                if s[4] and s[1] not in env:
                    env[s[1]] = UNDEFINED
                self._hoist([s[3]], env)
            elif k == "label":
                self._hoist([s[2]], env)
            elif k == "try":
                self._hoist([s[1]], env)
                if s[3] is not None:
                    self._hoist([s[3]], env)
                if s[4] is not None:
                    self._hoist([s[4]], env)
            elif k == "switch":
                for _test, body in s[2]:
                    self._hoist(body, env)

    # -- statements --------------------------------------------------------
    def exec_stmt(self, node, env, label=None):
        self._tick()
        kind = node[0]
        if kind == "label":
            # ES5 12.12: the label binds to the directly-enclosed
            # statement; a labeled break targets it even when it is not
            # a loop (then it just exits the statement)
            try:
                return self.exec_stmt(node[2], env, label=node[1])
            except _Break as b:
                if b.label == node[1]:
                    return UNDEFINED
                raise
        if kind == "block":
            last = UNDEFINED
            for s in node[1]:
                last = self.exec_stmt(s, env)
            return last
        if kind == "with":
            obj = self.eval(node[1], env)
            if not isinstance(obj, dict):
                raise MiniJsError("with requires an object")
            # name resolution checks __with__ objects before the scope's
            # own bindings (see the name/eval and _store loops)
            return self.exec_stmt(node[2], {"__parent__": env,
                                            "__with__": obj})
        if kind == "decl":
            for name, init in node[1]:
                if init is None:
                    continue  # bare `var x;` — binding already hoisted
                # assign through the scope chain: the binding was hoisted
                # into the function scope, and inside a with block the
                # walk correctly hits a same-named with-object property
                # first (ES5 12.2 + 10.2.1.2)
                self._store(("name", name), self.eval(init, env), env)
            return UNDEFINED
        if kind == "fdecl":
            # bound by the hoisting pass before the scope ran; late-bind
            # only if this scope was entered without hoisting
            if node[1] not in env:
                env[node[1]] = _Function(node[2][1], node[2][2], env)
            return UNDEFINED
        if kind == "if":
            if _truthy(self.eval(node[1], env)):
                return self.exec_stmt(node[2], env)
            if node[3] is not None:
                return self.exec_stmt(node[3], env)
            return UNDEFINED
        if kind == "while":
            while _truthy(self.eval(node[1], env)):
                self._tick()
                try:
                    self.exec_stmt(node[2], env)
                except _Break as b:
                    if b.label is None or b.label == label:
                        break
                    raise
                except _Continue as c:
                    if c.label is None or c.label == label:
                        continue
                    raise
            return UNDEFINED
        if kind == "dowhile":
            while True:
                self._tick()
                try:
                    self.exec_stmt(node[2], env)
                except _Break as b:
                    if b.label is None or b.label == label:
                        break
                    raise
                except _Continue as c:
                    if c.label is not None and c.label != label:
                        raise
                if not _truthy(self.eval(node[1], env)):
                    break
            return UNDEFINED
        if kind == "for":
            if node[1] is not None:
                self.exec_stmt(node[1], env)
            while node[2] is None or _truthy(self.eval(node[2], env)):
                self._tick()
                try:
                    self.exec_stmt(node[4], env)
                except _Break as b:
                    if b.label is None or b.label == label:
                        break
                    raise
                except _Continue as c:
                    if c.label is not None and c.label != label:
                        raise
                if node[3] is not None:
                    self.eval(node[3], env)
            return UNDEFINED
        if kind == "forin":
            name, declared = node[1], node[4]
            obj = self.eval(node[2], env)
            if isinstance(obj, dict):
                # own enumerable keys (integer-like ascending first,
                # then insertion order), then un-shadowed prototype-
                # chain keys (ES5 12.6.4 walks [[Prototype]])
                keys = _own_keys(obj, self)
                seen = set(obj.keys())
                p = getattr(obj, "proto", None)
                while isinstance(p, dict):
                    for k in _own_keys(p, self):
                        if k not in seen:
                            seen.add(k)
                            keys.append(k)
                    p = getattr(p, "proto", None)
            elif isinstance(obj, (list, str)):
                keys = [str(i) for i in range(len(obj))
                        if not (isinstance(obj, list)
                                and obj[i] is HOLE)]
                if isinstance(obj, list):
                    lp = self._list_props_of(obj)
                    if lp:
                        keys.extend(lp.keys())
            else:
                keys = []  # null/undefined/primitives iterate nothing
            for k in keys:
                self._tick()
                if declared:
                    env[name] = k
                else:
                    self._store(("name", name), k, env)
                try:
                    self.exec_stmt(node[3], env)
                except _Break as b:
                    if b.label is None or b.label == label:
                        break
                    raise
                except _Continue as c:
                    if c.label is not None and c.label != label:
                        raise
            return UNDEFINED
        if kind == "switch":
            d = self.eval(node[1], env)
            cases = node[2]
            idx = next((i for i, (t, _) in enumerate(cases)
                        if t is not None
                        and self._strict_eq(d, self.eval(t, env))), None)
            if idx is None:  # default clause, wherever it sits
                idx = next((i for i, (t, _) in enumerate(cases)
                            if t is None), None)
            if idx is not None:
                try:
                    for _, body in cases[idx:]:  # fall-through until break
                        for s in body:
                            self.exec_stmt(s, env)
                except _Break as b:
                    if b.label is not None:  # labeled break escapes switch
                        raise
            return UNDEFINED
        if kind == "break":
            raise _Break(node[1] if len(node) > 1 else None)
        if kind == "continue":
            raise _Continue(node[1] if len(node) > 1 else None)
        if kind == "try":
            _block, catch_name, catch_block, fin = node[1:]
            # completion value: the try block's (or, after a throw, the
            # catch block's); finally's value is discarded (ES5 12.14)
            last = UNDEFINED
            try:
                try:
                    last = self.exec_stmt(_block, env)
                except _Thrown as t:
                    if catch_block is not None:
                        local = {"__parent__": env, catch_name: t.value}
                        last = self.exec_stmt(catch_block, local)
                    else:
                        raise
                except MiniJsBudgetError:
                    raise
                except MiniJsError as exc:
                    # native runtime errors are catchable, like JS
                    if catch_block is not None:
                        local = {"__parent__": env,
                                 catch_name: {"name": "Error",
                                              "message": str(exc)}}
                        last = self.exec_stmt(catch_block, local)
                    else:
                        raise
            finally:
                if fin is not None:
                    self.exec_stmt(fin, env)
            return last
        if kind == "return":
            raise _Return(self.eval(node[1], env))
        if kind == "throw":
            raise _Thrown(self.eval(node[1], env))
        if kind == "expr":
            return self.eval(node[1], env)
        raise MiniJsError(f"bad statement {kind}")

    # -- expressions -------------------------------------------------------
    def eval(self, node, env):
        self._tick()
        kind = node[0]
        if kind == "lit":
            return node[1]
        if kind == "name":
            name = node[1]
            e = env
            while e is not None:
                if name in e:
                    return e[name]
                w = e.get("__with__")
                if w is not None:
                    v, found = _proto_lookup(w, name)
                    if found:
                        return v.read(self, w) if isinstance(
                            v, _Accessor) else v
                e = e.get("__parent__")
            builtin = _GLOBALS.get(name, UNDEFINED)
            if builtin is UNDEFINED and name not in _GLOBALS:
                raise MiniJsError(f"undefined variable {name!r}")
            return builtin
        if kind == "array":
            return [self.eval(x, env) for x in node[1]]
        if kind == "object":
            out = {}
            for k, v in node[1]:
                if v[0] == "accessor":
                    acc = out.get(k)
                    if not isinstance(acc, _Accessor):
                        acc = _Accessor()
                        acc.interp = self
                    fn = _Function(v[2][1], v[2][2], env)
                    if v[1] == "get":
                        acc.getter = fn
                    else:
                        acc.setter = fn
                    out[k] = acc
                else:
                    out[k] = self.eval(v, env)
            for v in out.values():
                if isinstance(v, _Accessor):
                    v.owner = out
            return out
        if kind == "func":
            return _Function(node[1], node[2], env)
        if kind == "namedfunc":
            # the function expression's own name binds in a scope layer
            # visible only to the function body (ES5 13 FunctionExpression)
            scope = {"__parent__": env}
            f = _Function(node[2][1], node[2][2], scope)
            scope[node[1]] = f
            return f
        if kind == "regexlit":
            return _RegExp(node[1], node[2])
        if kind == "not":
            return not _truthy(self.eval(node[1], env))
        if kind == "bitnot":
            return float(_as_i32(~_to_int32(self.eval(node[1], env))))
        if kind == "neg":
            return -_num(self._to_primitive(self.eval(node[1], env),
                                            "number"))
        if kind == "pos":
            return _num(self._to_primitive(self.eval(node[1], env),
                                           "number"))
        if kind == "typeof":
            if node[1][0] == "name":
                # typeof on an undeclared name is 'undefined', never a
                # ReferenceError (ES5 11.4.3)
                try:
                    v = self.eval(node[1], env)
                except MiniJsBudgetError:
                    raise
                except MiniJsError:
                    return "undefined"
            else:
                v = self.eval(node[1], env)
            if v is UNDEFINED:
                return "undefined"
            if isinstance(v, bool):
                return "boolean"
            if isinstance(v, float):
                return "number"
            if isinstance(v, str):
                return "string"
            if isinstance(v, (_Function, _NativeThis, _Callable, _Bound)) \
                    or callable(v):
                return "function"
            return "object"
        if kind == "void":
            self.eval(node[1], env)
            return UNDEFINED
        if kind == "seq":  # comma operator: evaluate both, keep the right
            self.eval(node[1], env)
            return self.eval(node[2], env)
        if kind == "ternary":
            return (self.eval(node[2], env) if _truthy(self.eval(node[1], env))
                    else self.eval(node[3], env))
        if kind == "bin":
            return self._binop(node[1], node[2], node[3], env)
        if kind == "member":
            return self._member(self.eval(node[1], env), node[2])
        if kind == "index":
            obj = self.eval(node[1], env)
            idx = self.eval(node[2], env)
            if isinstance(obj, list):
                f = _num(idx) if not isinstance(idx, bool) else math.nan
                if math.isnan(f) or f != int(f) or f < 0:
                    # non-index key: the full property protocol —
                    # a['length'], a['join'], expandos, negative ints
                    # (JS array indexing IS property access)
                    return self._member(obj, _to_str(idx))
                i = int(f)
                return _unhole(obj[i]) if 0 <= i < len(obj) else UNDEFINED
            if isinstance(obj, dict):
                return self._member(obj, _to_str(idx))
            if isinstance(obj, str):
                f = _num(idx) if not isinstance(idx, bool) else math.nan
                if math.isnan(f) or f != int(f) or f < 0:
                    return self._member(obj, _to_str(idx))
                i = int(f)
                return obj[i] if 0 <= i < len(obj) else UNDEFINED
            # everything else (functions, regexes, …): property read
            return self._member(obj, _to_str(idx))
        if kind == "call":
            return self._call(node, env)
        if kind == "new":
            ctor = node[1]
            args = [self.eval(a, env) for a in node[2]]
            if ctor[0] == "name" and not self._resolvable(ctor[1], env):
                # built-in constructors (only when the name is not a
                # user-defined function shadowing them)
                if ctor[1] in ("Error", "TypeError", "RangeError",
                               "SyntaxError"):
                    return {"name": ctor[1],
                            "message": _to_str(args[0]) if args else ""}
                if ctor[1] == "Date":
                    if args and isinstance(args[0], str):
                        ms = _date_parse(args[0])
                    elif len(args) >= 2:  # new Date(y, mo[, d, ...])
                        ms = _date_utc(args)
                    else:
                        ms = _num(args[0]) if args else self.now_ms
                    return _date_object(ms)
                if ctor[1] == "RegExp":
                    if args and isinstance(args[0], _RegExp):
                        return _RegExp(args[0].source,
                                       _to_str(args[1]) if len(args) > 1
                                       else args[0].flags)
                    return _RegExp(_to_str(args[0]) if args else "",
                                   _to_str(args[1]) if len(args) > 1 else "")
                if ctor[1] == "Object":
                    return _JsObject()
                if ctor[1] == "Array":
                    if len(args) == 1 and isinstance(args[0], float):
                        return [HOLE] * int(args[0])
                    return list(args)
            fn = self.eval(ctor, env)
            if isinstance(fn, _Callable) and fn.name == "RegExp":
                if args and isinstance(args[0], _RegExp):
                    return _RegExp(args[0].source,
                                   _to_str(args[1]) if len(args) > 1
                                   else args[0].flags)
                return _RegExp(_to_str(args[0]) if args else "",
                               _to_str(args[1]) if len(args) > 1 else "")
            if isinstance(fn, _Callable) and fn.name == "Function":
                return _function_ctor(self, args)  # new Function(...)
            if isinstance(fn, _Function):
                # general ES5 construction: fresh object linked to
                # fn.prototype, constructor body with this=obj; an
                # explicit object return wins (ES5 13.2.2)
                obj = _JsObject(proto=fn.prototype())
                ret = self._invoke(fn, args, this_val=obj)
                return ret if isinstance(ret, (dict, list)) else obj
            raise MiniJsError("value is not a constructor")
        if kind == "delete":
            target = node[1]
            if target[0] == "name":
                # var bindings are non-configurable: delete x is false;
                # an unresolvable name deletes vacuously true (11.4.1)
                return not self._resolvable(target[1], env)
            obj = self.eval(target[1], env)
            key = target[2] if target[0] == "member" else _to_str(
                self.eval(target[2], env))
            if self._integrity_of(obj) in ("seal", "freeze"):
                return False  # sealed/frozen properties are
                # non-configurable (ES5 15.2.3.8-9)
            if isinstance(obj, dict):
                obj.pop(key, None)
                return True
            if isinstance(obj, list):
                try:
                    i = int(float(key))
                except ValueError:
                    lp = self._list_props_of(obj)
                    if lp is not None:
                        lp.pop(key, None)  # expando property
                    return True
                if 0 <= i < len(obj):
                    obj[i] = HOLE  # JS delete leaves a real hole
                return True
            return True
        if kind == "assign":
            return self._assign(node, env)
        if kind == "postincr":
            op, target = node[1], node[2]
            old = _num(self.eval(target, env))
            new = old + 1 if op == "++" else old - 1
            self._store(target, new, env)
            return old
        if kind == "preincr":
            op, target = node[1], node[2]
            new = _num(self.eval(target, env)) + (1 if op == "++" else -1)
            self._store(target, new, env)
            return new
        raise MiniJsError(f"bad expression {kind}")

    def _binop(self, op, ln, rn, env):
        if op == "&&":
            left = self.eval(ln, env)
            return self.eval(rn, env) if _truthy(left) else left
        if op == "||":
            left = self.eval(ln, env)
            return left if _truthy(left) else self.eval(rn, env)
        a = self.eval(ln, env)
        b = self.eval(rn, env)
        if op in ("+", "-", "*", "/", "%", "<", "<=", ">", ">="):
            # ToPrimitive on object operands (ES5 11.6.1 / 11.8.5: '+'
            # uses the default hint, relationals hint number)
            hint = "default" if op == "+" else "number"
            if isinstance(a, dict):
                a = self._to_primitive(a, hint)
            if isinstance(b, dict):
                b = self._to_primitive(b, hint)
            # arrays have no valueOf: ToPrimitive is their join string,
            # which relationals then compare AS STRINGS when both sides
            # end up strings ([] < '0' is '' < '0' — ES5 11.8.5)
            if isinstance(a, list):
                a = _to_str(a)
            if isinstance(b, list):
                b = _to_str(b)
        if op == "+":
            if isinstance(a, str) or isinstance(b, str):
                return _to_str(a) + _to_str(b)
            if isinstance(a, list) or isinstance(b, list):
                return _to_str(a) + _to_str(b)
            return _num(a) + _num(b)
        if op == "-":
            return _num(a) - _num(b)
        if op == "*":
            return _num(a) * _num(b)
        if op == "/":
            d = _num(b)
            if d == 0:
                n = _num(a)
                if n == 0 or math.isnan(n):
                    return math.nan
                # sign of ±0 matters: 1/-0 === -Infinity (IEEE 754)
                neg = (n < 0) != (math.copysign(1.0, d) < 0)
                return -math.inf if neg else math.inf
            return _num(a) / d
        if op == "%":
            d = _num(b)
            return _js_mod(_num(a), d)
        if op in ("&", "|", "^", "<<", ">>", ">>>"):
            return self._binop_values(op, a, b)
        if op == "===":
            return self._strict_eq(a, b)
        if op == "!==":
            return not self._strict_eq(a, b)
        if op == "==":
            return self._loose_eq(a, b)
        if op == "!=":
            return not self._loose_eq(a, b)
        if op in ("<", "<=", ">", ">="):
            if isinstance(a, str) and isinstance(b, str):
                pass
            else:
                a, b = _num(a), _num(b)
            return {"<": a < b, "<=": a <= b, ">": a > b, ">=": a >= b}[op]
        if op == "in":
            key = _to_str(a)
            if isinstance(b, dict):
                return (_proto_lookup(b, key)[1]
                        or key in _OBJECT_PROTO)
            if isinstance(b, list):
                if key == "length":
                    return True
                lp = self._list_props_of(b)
                if lp is not None and key in lp:
                    return True
                try:
                    i = int(float(key))
                except ValueError:
                    return False
                return 0 <= i < len(b) and b[i] is not HOLE
            raise MiniJsError("'in' requires an object operand")
        if op == "instanceof":
            if isinstance(b, _Function):  # user constructor: walk [[Proto]]
                proto = b.props.get("prototype")
                p = getattr(a, "proto", None)
                while isinstance(p, dict):
                    if p is proto:
                        return True
                    p = getattr(p, "proto", None)
                return False
            name = b.name if isinstance(b, _Callable) else None
            if name == "RegExp":
                return isinstance(a, _RegExp)
            if name == "Array":
                return isinstance(a, list)
            if name == "Function":
                return isinstance(a, (_Function, _NativeThis, _Callable,
                                      _Bound))
            if name == "Object":
                return isinstance(a, (dict, list, _RegExp))
            if name in _ERROR_NAMES:
                return (isinstance(a, dict)
                        and isinstance(a.get("name"), str)
                        and "message" in a
                        and (a["name"] == name
                             or (name == "Error"
                                 and a["name"].endswith("Error"))))
            raise MiniJsError("instanceof supports RegExp/Array/Function/"
                              "Object/Error only")
        raise MiniJsError(f"bad operator {op}")

    @staticmethod
    def _binop_values(op, a, b):
        x, y = _to_int32(a), _to_int32(b)
        if op == "&":
            return float(_as_i32(x & y))
        if op == "|":
            return float(_as_i32(x | y))
        if op == "^":
            return float(_as_i32(x ^ y))
        sh = y & 31
        if op == "<<":
            return float(_as_i32((x << sh) & 0xFFFFFFFF))
        if op == ">>":
            return float(x >> sh)
        return float((x & 0xFFFFFFFF) >> sh)  # >>> unsigned

    @staticmethod
    def _strict_eq(a, b):
        if isinstance(a, bool) != isinstance(b, bool):
            return False
        if isinstance(a, (dict, list)) or isinstance(b, (dict, list)):
            return a is b  # JS object equality is identity, not value
        if type(a) is type(b) or (isinstance(a, float) and isinstance(b, float)):
            return a == b
        if a is None and b is None:
            return True
        return a is b

    def _to_primitive(self, v, hint="default"):
        """ES5 8.12.8 [[DefaultValue]] for engine dict objects: invoke
        valueOf then toString (number/default hint; Date objects prefer
        string on the default hint, detected by their getTime +
        toISOString natives) through the interpreter, first primitive
        result wins. Non-dicts and method-less dicts pass through (the
        caller's _to_str then yields '[object Object]')."""
        if not isinstance(v, dict):
            return v
        if hint == "default" and "getTime" in v and "toISOString" in v:
            hint = "string"
        order = (("toString", "valueOf") if hint == "string"
                 else ("valueOf", "toString"))
        for name in order:
            f, found = _proto_lookup(v, name)
            if found and not isinstance(f, _Accessor):
                try:
                    r = self._invoke(f, [], this_val=v)
                except MiniJsBudgetError:
                    raise
                except MiniJsError:
                    continue
                if not isinstance(r, (dict, list)):
                    return r
        # method-less plain object: Object.prototype.toString applies
        # (ES5 8.12.8 falls through to the default toString)
        return _to_str(v)

    def _loose_eq(self, a, b):
        """ES5 11.9.3 abstract equality over the engine's value model:
        null == undefined, number/string/boolean coercion, objects via
        ToPrimitive (the engine's own string conversion — minijs objects
        carry no valueOf)."""
        def is_obj(v):
            return (isinstance(v, (dict, list, _RegExp))
                    or isinstance(v, (_Function, _NativeThis, _Callable,
                                      _Bound))
                    or (callable(v) and not isinstance(v, (str, float))))

        if isinstance(a, bool):
            return self._loose_eq(float(a), b)
        if isinstance(b, bool):
            return self._loose_eq(a, float(b))
        if a is UNDEFINED or a is None:
            return b is UNDEFINED or b is None
        if b is UNDEFINED or b is None:
            return False
        if isinstance(a, float) and isinstance(b, str):
            return a == _num(b)
        if isinstance(a, str) and isinstance(b, float):
            return _num(a) == b
        if is_obj(a) and is_obj(b):
            return self._strict_eq(a, b)
        if is_obj(a):
            p = self._to_primitive(a)
            return self._loose_eq(p if not is_obj(p) else _to_str(a), b)
        if is_obj(b):
            p = self._to_primitive(b)
            return self._loose_eq(a, p if not is_obj(p) else _to_str(b))
        return self._strict_eq(a, b)

    def _member(self, obj, name):
        if hasattr(obj, "js_member"):  # host objects (e.g. domjs.DomNode)
            return obj.js_member(self, name)
        if name == "length":
            if isinstance(obj, (str, list)):
                return float(len(obj))
        if isinstance(obj, _Callable):
            if obj.name == "Function" and name == "prototype":
                return self._function_proto
            if name in obj.props:
                return obj.props[name]
            if name in ("call", "apply", "bind"):
                return self._call_apply(obj, name)
            raise MiniJsError(f"unsupported property {obj.name}.{name}")
        if isinstance(obj, _Function):
            if name == "prototype":
                return obj.prototype()
            if name == "length":  # declared-parameter count (ES5 15.3.5.1)
                return float(len(obj.params))
            if name in obj.props:
                return obj.props[name]
        if isinstance(obj, (_Function, _NativeThis, _Bound)) or (
                callable(obj) and not isinstance(obj, dict)):
            if name in ("call", "apply", "bind"):
                return self._call_apply(obj, name)
        if isinstance(obj, _RegExp):
            if name == "source":
                return obj.source
            if name == "flags":
                return obj.flags
            if name == "global":
                return obj.is_global
            if name == "ignoreCase":
                return "i" in obj.flags
            if name == "multiline":
                return "m" in obj.flags
            if name == "lastIndex":
                return obj.last_index
            if name == "test":
                return lambda it, a: obj.test(_to_str(a[0]) if a else "")
            if name == "exec":
                return lambda it, a: obj.exec(_to_str(a[0]) if a else "")
            return UNDEFINED  # unknown property reads yield undefined (JS)
        if isinstance(obj, dict):
            v, found = _proto_lookup(obj, name)
            if found:
                if isinstance(v, _Accessor):
                    return v.read(self, obj)
                return v
            if getattr(obj, "null_proto", False):
                return UNDEFINED  # Object.create(null): no fallback
            m = _OBJECT_PROTO.get(name)
            if m is not None:  # Object.prototype.* fallback, this-bound
                return _Bound(m.fn, obj)
            return UNDEFINED
        if isinstance(obj, _MatchArray) and name in ("index", "input"):
            return getattr(obj, name)
        if isinstance(obj, list):
            lp = self._list_props_of(obj)
            if lp is not None and name in lp:
                return lp[name]
        if name == "constructor":  # primitive wrappers (ES5 15.x.4.1)
            if isinstance(obj, str):
                return _GLOBALS["String"]
            if isinstance(obj, bool):
                return _GLOBALS["Boolean"]
            if isinstance(obj, float):
                return _GLOBALS["Number"]
            if isinstance(obj, list):
                return _GLOBALS["Array"]
        if isinstance(obj, _Arguments) and name == "callee":
            return obj.callee
        # list subclasses (_MatchArray) must dispatch as "list"
        tname = ("list" if isinstance(obj, list)
                 else "float" if isinstance(obj, float)
                 else type(obj).__name__)
        method = _METHODS.get((tname, name))
        if method is not None:
            return _Bound(method, obj)
        if obj is UNDEFINED or obj is None:
            raise MiniJsError(f"cannot read property {name!r} of {_to_str(obj)}")
        return UNDEFINED  # unknown property reads yield undefined (JS)

    @staticmethod
    def _call_apply(fn, how):
        """fn.call(thisArg, ...) / fn.apply(thisArg, argsArray) /
        fn.bind(thisArg, ...preArgs) (ES5 15.3.4.5)."""

        def _dispatch(it, this, rest):
            if isinstance(fn, _NativeThis):
                return fn.fn(it, this, rest)
            if isinstance(fn, _Bound):
                return fn.method(it, this, rest)
            return it._invoke(fn, rest, this_val=this)

        def wrapper(it, a):
            this = a[0] if a else UNDEFINED
            if how == "bind":
                pre = list(a[1:])

                def bound(it2, b):
                    return _dispatch(it2, this, pre + list(b))

                return bound
            rest = (list(a[1]) if len(a) > 1 and isinstance(a[1], list)
                    else []) if how == "apply" else list(a[1:])
            return _dispatch(it, this, rest)

        return wrapper

    @staticmethod
    def _resolvable(name, env) -> bool:
        e = env
        while e is not None:
            if name in e:
                return True
            w = e.get("__with__")
            if w is not None and _proto_lookup(w, name)[1]:
                return True
            e = e.get("__parent__")
        return False

    def _call(self, node, env):
        callee_node = node[1]
        args = [self.eval(a, env) for a in node[2]]
        # method call: o.f(...) / o["f"](...) binds this=o for user
        # functions and this-aware natives found directly or through the
        # prototype chain (the obj expression is evaluated exactly once)
        if callee_node[0] in ("member", "index"):
            obj = self.eval(callee_node[1], env)
            if callee_node[0] == "member":
                name = callee_node[2]
                fn = self._member(obj, name)
            else:
                idx = self.eval(callee_node[2], env)
                if isinstance(obj, list):
                    f = (_num(idx) if not isinstance(idx, bool)
                         else math.nan)
                    if math.isnan(f) or f != int(f) or f < 0:
                        # a['join'](...) — property-protocol callee
                        fn = self._member(obj, _to_str(idx))
                    else:
                        i = int(f)
                        fn = (_unhole(obj[i]) if 0 <= i < len(obj)
                              else UNDEFINED)
                else:
                    fn = self._member(obj, _to_str(idx))
            if isinstance(fn, _Function):
                return self._invoke(fn, args, this_val=obj)
            if isinstance(fn, _NativeThis):
                return fn.fn(self, obj, args)
            return self._invoke(fn, args)
        fn = self.eval(callee_node, env)
        return self._invoke(fn, args)

    def _invoke(self, fn, args, this_val=UNDEFINED):
        self._tick()
        if isinstance(fn, _Bound):
            return fn.method(self, fn.obj, args)
        if isinstance(fn, _NativeThis):
            return fn.fn(self, this_val, args)
        if isinstance(fn, _Callable):
            return fn.fn(self, args)
        if isinstance(fn, _Function):
            if this_val is UNDEFINED:
                # non-strict plain call: this = the global object
                # (ES5 10.4.3); the root scope dict plays that role
                this_val = getattr(self, "global_env", UNDEFINED)
            argobj = _Arguments(args)
            argobj.callee = fn
            local = {"__parent__": fn.env, "arguments": argobj,
                     "this": this_val}
            for i, p in enumerate(fn.params):
                local[p] = args[i] if i < len(args) else UNDEFINED
            argobj.env = local
            argobj.params = list(fn.params)
            try:
                self._hoist(fn.body[1], local)
                self.exec_stmt(fn.body, local)
            except _Return as r:
                return r.value
            return UNDEFINED
        if callable(fn):
            return fn(self, args)
        raise MiniJsError("value is not callable")

    def _assign(self, node, env):
        op, target, right = node[1], node[2], node[3]
        value = self.eval(right, env)
        if op != "=":
            old = self.eval(target, env)
            base = op[0]
            if base == "+" and (isinstance(old, str) or isinstance(value, str)):
                value = _to_str(old) + _to_str(value)
            elif op in ("&=", "|=", "^=", "<<=", ">>=", ">>>="):
                value = self._binop_values(op[:-1], old, value)
            else:
                value = {"+": lambda: _num(old) + _num(value),
                         "-": lambda: _num(old) - _num(value),
                         "*": lambda: _num(old) * _num(value),
                         "/": lambda: _num(old) / _num(value),
                         "%": lambda: _js_mod(_num(old),
                                              _num(value))}[base]()
        self._store(target, value, env)
        return value

    def _store(self, target, value, env):
        if target[0] == "name":
            name = target[1]
            e = env
            while e is not None:
                if name in e:
                    e[name] = value
                    ao = e.get("arguments")
                    if (isinstance(ao, _Arguments) and ao.params
                            and name in ao.params):
                        i = ao.params.index(name)
                        if i < len(ao):  # param write → arguments[i]
                            list.__setitem__(ao, i, value)
                    return
                w = e.get("__with__")
                if w is not None and _proto_lookup(w, name)[1]:
                    self._dict_store(w, name, value)
                    return
                e = e.get("__parent__")
            # implicit global (JS semantics): lands in the innermost
            # NON-with scope — a with wrapper is an object environment,
            # never a binding target for new names (ES5 10.2.1.2)
            while "__with__" in env:
                env = env["__parent__"]
            env[name] = value
            return
        if target[0] == "member":
            obj = self.eval(target[1], env)
            if isinstance(obj, _RegExp) and target[2] == "lastIndex":
                obj.last_index = _num(value)
                return
            if hasattr(obj, "js_set_member"):
                obj.js_set_member(self, target[2], value)
                return
            if isinstance(obj, _Function):
                obj.props[target[2]] = value
                return
            if isinstance(obj, list) and target[2] == "length":
                # ES5 15.4.5.1: assigning length truncates or extends
                # with holes (engine holes are UNDEFINED)
                if self._integrity_of(obj) is not None:
                    return
                n = _js_int((value))
                if n < 0 or _num(value) != n:
                    raise _Thrown({"name": "RangeError",
                                   "message": "invalid array length"})
                del obj[n:]
                obj.extend([HOLE] * (n - len(obj)))
                return
            if isinstance(obj, list):
                if self._integrity_of(obj) != "freeze":
                    self._list_props_of(obj, create=True)[target[2]] = value
                return
            if not isinstance(obj, dict):
                raise MiniJsError("cannot set property on non-object")
            self._dict_store(obj, target[2], value)
            return
        if target[0] == "index":
            obj = self.eval(target[1], env)
            idx = self.eval(target[2], env)
            if isinstance(obj, list):
                lvl = self._integrity_of(obj)
                f = _num(idx)
                if math.isnan(f) or f != int(f) or f < 0:
                    # non-index key: an expando property (ES5 15.4 —
                    # arrays are objects)
                    if lvl == "freeze":
                        return
                    self._list_props_of(obj, create=True)[_to_str(idx)] = value
                    return
                i = int(f)
                if lvl == "freeze" or (lvl is not None and i >= len(obj)):
                    return  # silently ignored (non-strict ES5)
                while len(obj) <= i:
                    obj.append(HOLE)
                obj[i] = value
                return
            if isinstance(obj, dict):
                self._dict_store(obj, _to_str(idx), value)
                return
            if isinstance(obj, _Function):
                obj.props[_to_str(idx)] = value  # fn[name] = … (the
                # UMD export idiom: _.each(names, n => _[n] = fns[n]))
                return
            if isinstance(obj, _Callable):
                obj.props[_to_str(idx)] = value
                return
            raise MiniJsError("cannot index-assign this value")
        raise MiniJsError("bad assignment target")

    def _dict_store(self, obj, key, value):
        # an accessor property (own or inherited) routes the write to
        # its setter; otherwise a plain own-property set
        cur, found = _proto_lookup(obj, key)
        if found and isinstance(cur, _Accessor):
            cur.write(self, obj, value)
            return
        lvl = self._integrity_of(obj)
        if lvl == "freeze" or (lvl is not None and key not in obj):
            return  # non-strict JS: writes to frozen / adds to sealed
            # or non-extensible objects are silently ignored (ES5 8.12.5)
        obj[key] = value


class _Bound:
    def __init__(self, method, obj):
        self.method = method
        self.obj = obj


def _m(fn):
    return fn


_METHODS = {
    # strings
    ("str", "toLowerCase"): _m(lambda it, s, a: s.lower()),
    ("str", "toUpperCase"): _m(lambda it, s, a: s.upper()),
    ("str", "trim"): _m(lambda it, s, a: s.strip()),
    ("str", "split"): _m(lambda it, s, a: _str_split(s, a)),
    ("str", "indexOf"): _m(lambda it, s, a: float(s.find(
        _to_str(a[0]), max(0, _js_int((a[1]))) if len(a) > 1 else 0))),
    ("str", "lastIndexOf"): _m(lambda it, s, a: _str_last_index_of(s, a)),
    ("str", "substr"): _m(lambda it, s, a: _substr_b23(s, a)),
    ("str", "localeCompare"): _m(lambda it, s, a: float(
        (s > _to_str(a[0])) - (s < _to_str(a[0])))),
    ("str", "valueOf"): _m(lambda it, s, a: s),
    ("str", "toString"): _m(lambda it, s, a: s),
    ("str", "search"): _m(lambda it, s, a: _str_search(s, a)),
    ("str", "includes"): _m(lambda it, s, a: _to_str(a[0]) in s),
    ("str", "slice"): _m(lambda it, s, a: _slice(s, a)),
    ("str", "substring"): _m(lambda it, s, a: _substring(s, a)),
    ("str", "replace"): _m(lambda it, s, a: _str_replace(it, s, a)),
    ("str", "match"): _m(lambda it, s, a: _str_match(s, a)),
    ("str", "startsWith"): _m(lambda it, s, a: s.startswith(_to_str(a[0]))),
    ("str", "endsWith"): _m(lambda it, s, a: s.endswith(_to_str(a[0]))),
    ("str", "charAt"): _m(lambda it, s, a: s[_js_int((a[0]))]
                          if 0 <= _js_int((a[0])) < len(s) else ""),
    ("str", "charCodeAt"): _m(lambda it, s, a: float(ord(s[_js_int((a[0]) if a
                              else 0.0)])) if 0 <= _js_int((a[0]) if a else
                              0.0) < len(s) else math.nan),
    ("str", "repeat"): _m(lambda it, s, a: s * _js_int((a[0]))),
    ("str", "concat"): _m(lambda it, s, a: s + "".join(_to_str(x) for x in a)),
    # arrays
    ("list", "push"): _m(lambda it, l, a: (l.extend(a), float(len(l)))[1]),
    ("list", "pop"): _m(lambda it, l, a: _unhole(l.pop())
                        if l else UNDEFINED),
    ("list", "join"): _m(lambda it, l, a: (_to_str(a[0]) if a else ",").join(
        "" if x is None or x is UNDEFINED or x is HOLE else _to_str(x)
        for x in l)),
    ("list", "indexOf"): _m(lambda it, l, a: _arr_index_of(l, a)),
    ("list", "includes"): _m(lambda it, l, a: a[0] in l),
    ("list", "slice"): _m(lambda it, l, a: _slice(l, a)),
    ("list", "concat"): _m(lambda it, l, a: l + [x for arg in a for x in
                                                 (arg if isinstance(arg, list)
                                                  else [arg])]),
    ("list", "reverse"): _m(lambda it, l, a: (l.reverse(), l)[1]),
    ("list", "map"): _m(lambda it, l, a: [
        x if x is HOLE
        else it._invoke(a[0], [x, float(i), l], _this_arg(a))
        for i, x in enumerate(l)]),
    ("list", "filter"): _m(lambda it, l, a: [
        x for i, x in enumerate(l) if x is not HOLE
        and _truthy(it._invoke(a[0], [x, float(i), l], _this_arg(a)))]),
    ("list", "shift"): _m(lambda it, l, a: _unhole(l.pop(0))
                          if l else UNDEFINED),
    ("list", "unshift"): _m(lambda it, l, a: (l.__setitem__(slice(0, 0), a),
                                              float(len(l)))[1]),
    ("list", "forEach"): _m(lambda it, l, a: (
        [it._invoke(a[0], [x, float(i), l], _this_arg(a))
         for i, x in enumerate(l) if x is not HOLE], UNDEFINED)[1]),
    ("list", "some"): _m(lambda it, l, a: any(
        _truthy(it._invoke(a[0], [x, float(i), l], _this_arg(a)))
        for i, x in enumerate(l) if x is not HOLE)),
    ("list", "every"): _m(lambda it, l, a: all(
        _truthy(it._invoke(a[0], [x, float(i), l], _this_arg(a)))
        for i, x in enumerate(l) if x is not HOLE)),
    ("list", "reduce"): _m(lambda it, l, a: _reduce(it, l, a)),
    ("list", "reduceRight"): _m(lambda it, l, a: _reduce(it, l, a,
                                                         right=True)),
    ("list", "sort"): _m(lambda it, l, a: _sort(it, l, a)),
    ("list", "splice"): _m(lambda it, l, a: _splice(l, a)),
    ("list", "lastIndexOf"): _m(
        lambda it, l, a: _arr_index_of(l, a, last=True)),
    ("list", "hasOwnProperty"): _m(
        lambda it, l, a: _has_own(l, a[0] if a else UNDEFINED, it)),
    ("list", "propertyIsEnumerable"): _m(
        lambda it, l, a: _to_str(a[0] if a else UNDEFINED) != "length"
        and _has_own(l, a[0] if a else UNDEFINED, it)),
    # numbers
    ("float", "toFixed"): _m(lambda it, x, a: _js_to_fixed(
        x, _fmt_digits(a[0] if a else 0.0, 0, 20, "toFixed"))),
    ("float", "toString"): _m(lambda it, x, a: _num_to_string(x, a)),
    ("float", "toPrecision"): _m(lambda it, x, a: _js_exp(
        f"{x:.{_fmt_digits(a[0], 1, 21, 'toPrecision')}g}")
        if a and a[0] is not UNDEFINED else _to_str(x)),
    ("float", "toExponential"): _m(lambda it, x, a: _js_exp(
        f"{x:.{_fmt_digits(a[0] if a else 6.0, 0, 20, 'toExponential')}e}")),
    ("float", "valueOf"): _m(lambda it, x, a: x),
    ("bool", "toString"): _m(lambda it, b, a: "true" if b else "false"),
    ("bool", "valueOf"): _m(lambda it, b, a: b),
}


def _this_arg(a: list):
    """Second argument of the ES5 array-iteration methods (thisArg)."""
    return a[1] if len(a) > 1 else UNDEFINED


def _reduce(it, lst, a, right=False):
    items = [(i, x) for i, x in enumerate(lst) if x is not HOLE]
    if right:
        items = items[::-1]
    if len(a) > 1:
        acc = a[1]
    else:
        if not lst:
            raise _Thrown({"name": "TypeError",
                           "message": "Reduce of empty array "
                                      "with no initial value"})
        acc = items[0][1]
        items = items[1:]
    for i, x in items:
        acc = it._invoke(a[0], [acc, x, float(i), lst])
    return acc


def _define_property(it, a):
    """Object.defineProperty(obj, key, descriptor) — data descriptors
    set the value; accessor descriptors install an ES5 get/set pair
    (routed exactly like object-literal accessors)."""
    if len(a) < 3 or not isinstance(a[0], dict) or not isinstance(a[2], dict):
        raise MiniJsError("defineProperty(obj, key, descriptor)")
    obj, key, desc = a[0], _to_str(a[1]), a[2]
    getter = desc.get("get")
    setter = desc.get("set")
    if (getter is not None and getter is not UNDEFINED) or \
            (setter is not None and setter is not UNDEFINED):
        acc = obj.get(key)
        if not isinstance(acc, _Accessor):
            acc = _Accessor()
            acc.interp = it
        if getter is not None and getter is not UNDEFINED:
            acc.getter = getter
        if setter is not None and setter is not UNDEFINED:
            acc.setter = setter
        acc.owner = obj
        obj[key] = acc
    elif "value" in desc:
        obj[key] = desc["value"]
    if not _truthy(desc.get("enumerable")):
        # defineProperty defaults [[Enumerable]] to FALSE (ES5 8.12.9)
        it._mark_nonenum(obj, key)
    else:
        ent = it._nonenum.get(id(obj))
        if ent is not None and ent[0] is obj:
            ent[1].discard(key)  # redefinition can re-expose the key
    return obj


def _sort(it, lst, a):
    """In-place sort, JS semantics (ES5 15.4.4.11): default is string
    comparison; with a comparator the return sign orders the pair.
    undefined elements sort after every defined one, holes after
    undefined."""
    import functools

    body = [x for x in lst if x is not UNDEFINED and x is not HOLE]
    n_undef = sum(1 for x in lst if x is UNDEFINED)
    n_hole = len(lst) - len(body) - n_undef
    if a and a[0] is not UNDEFINED:
        fn = a[0]

        def cmp(x, y):
            r = _num(it._invoke(fn, [x, y]))
            return -1 if r < 0 else (1 if r > 0 else 0)

        body.sort(key=functools.cmp_to_key(cmp))
    else:
        body.sort(key=_to_str)
    lst[:] = body + [UNDEFINED] * n_undef + [HOLE] * n_hole
    return lst


def _str_split(s, a):
    if not a or a[0] is UNDEFINED:
        return [s]  # undefined separator -> [whole string] (15.5.4.14)
    sep = a[0]
    if isinstance(sep, _RegExp):
        out = list(sep.regex.split(s))
    else:
        sep = _to_str(sep)
        out = list(s) if sep == "" else list(s.split(sep))
    if len(a) > 1 and a[1] is not UNDEFINED:
        # ES5 15.5.4.14: limit TRUNCATES the result (it does not change
        # how many splits happen)
        out = out[:max(0, _js_int((a[1])))]
    return out


def _str_replace(it, s, a):
    pat, repl = a[0], a[1] if len(a) > 1 else UNDEFINED
    def do(match_text, groups=(), offset=0):
        if isinstance(repl, (_Function, _Bound)) or callable(repl):
            # function replacer args: match, p1..pn, offset, string
            # (ES5 15.5.4.11); unmatched groups pass as undefined
            return _to_str(it._invoke(repl, [
                match_text,
                *[UNDEFINED if g is None else g for g in groups],
                float(offset), s]))
        out = []
        i, r = 0, _to_str(repl)
        while i < len(r):
            if r[i] == "$" and i + 1 < len(r):
                c = r[i + 1]
                if c == "&":
                    out.append(match_text)
                    i += 2
                    continue
                if c == "$":
                    out.append("$")
                    i += 2
                    continue
                if c == "`":
                    out.append(s[:offset])
                    i += 2
                    continue
                if c == "'":
                    out.append(s[offset + len(match_text):])
                    i += 2
                    continue
                if c.isdigit():
                    # $nn: the LONGEST valid group number wins (ES5
                    # 15.5.4.11 table 22); $0 / out-of-range stay literal
                    two = r[i + 1:i + 3]
                    if (len(two) == 2 and two.isdigit()
                            and 1 <= int(two) <= len(groups)):
                        gi, adv = int(two) - 1, 3
                    elif 1 <= int(c) <= len(groups):
                        gi, adv = int(c) - 1, 2
                    else:
                        out.append(r[i])
                        i += 1
                        continue
                    out.append(groups[gi] or "")
                    i += adv
                    continue
            out.append(r[i])
            i += 1
        return "".join(out)

    if isinstance(pat, _RegExp):
        count = 0 if pat.is_global else 1
        return pat.regex.sub(
            lambda m: do(m.group(0), m.groups(), m.start()), s,
            count=count)
    p = _to_str(pat)
    return s.replace(p, do(p, (), s.find(p)), 1)


def _str_match(s, a):
    pat = a[0] if a else UNDEFINED
    rx = pat if isinstance(pat, _RegExp) else _RegExp(_to_str(pat), "")
    if rx.is_global:
        out = [m.group(0) for m in rx.regex.finditer(s)]
        return out or None
    m = rx.regex.search(s)
    if m is None:
        return None
    out = _MatchArray([m.group(0)] + [(g if g is not None else UNDEFINED)
                                      for g in m.groups()])
    out.index = float(m.start())  # non-global match = exec (15.5.4.10)
    out.input = s
    return out


def _slice(s, a):
    start = _js_int((a[0])) if a else 0
    end = _js_int((a[1])) if len(a) > 1 else len(s)
    return s[slice(start if start >= 0 else max(0, len(s) + start),
                   end if end >= 0 else max(0, len(s) + end))]


def _substring(s, a):
    start = max(0, _js_int((a[0]))) if a else 0
    end = max(0, _js_int((a[1]))) if len(a) > 1 else len(s)
    if start > end:
        start, end = end, start
    return s[start:end]


def _js_class(v) -> str:
    """Object.prototype.toString semantics."""
    if isinstance(v, list):
        return "[object Array]"
    if isinstance(v, bool):
        return "[object Boolean]"
    if isinstance(v, float):
        return "[object Number]"
    if isinstance(v, str):
        return "[object String]"
    if v is None:
        return "[object Null]"
    if v is UNDEFINED:
        return "[object Undefined]"
    if isinstance(v, _RegExp):
        return "[object RegExp]"
    if isinstance(v, (_Function, _NativeThis, _Callable, _Bound)):
        return "[object Function]"
    return "[object Object]"


def _has_own(this, key, it=None) -> bool:
    k = _to_str(key)
    if isinstance(this, dict):
        return k in this
    if isinstance(this, list):
        if k == "length":
            return True  # own non-enumerable property (ES5 15.4.5.2)
        if it is not None:
            lp = it._list_props_of(this)
            if lp and k in lp:
                return True
        try:
            i = int(k)
        except ValueError:
            return False
        return 0 <= i < len(this) and this[i] is not HOLE
    return False


_OBJECT_PROTO = {
    "hasOwnProperty": _NativeThis(
        lambda it, this, a: _has_own(this, a[0] if a else UNDEFINED,
                                     it)),
    # every own data property in this engine is enumerable (ES5 15.2.4.7
    # restricted to the model: accessor/defineProperty flags not tracked)
    "propertyIsEnumerable": _NativeThis(
        lambda it, this, a: _has_own(this, a[0] if a else UNDEFINED)),
    "toString": _NativeThis(lambda it, this, a: _js_class(this)),
}

_ARRAY_PROTO = {
    name: _NativeThis(
        lambda it, this, a, _meth=meth: _meth(
            it, this if isinstance(this, list) else [], a))
    for (tname, name), meth in list(_METHODS.items()) if tname == "list"
}

def _substr_b23(s: str, a: list) -> str:
    """String.prototype.substr (ES5 B.2.3): (start, length); negative
    start counts from the end."""
    n = len(s)
    start = _js_int((a[0])) if a else 0
    start = max(n + start, 0) if start < 0 else min(start, n)
    length = n - start if len(a) < 2 or a[1] is UNDEFINED \
        else max(0, _js_int((a[1])))
    return s[start:start + length]


def _js_exp(s: str) -> str:
    """Python zero-pads exponents ('1.23e+04'); JS does not ('1.23e+4')."""
    return _re.sub(r"e([+-])0*(\d)", r"e\1\2", s)


def _str_search(s: str, a: list) -> float:
    """String.prototype.search (ES5 15.5.4.12): RegExp or pattern string;
    ignores the g flag, returns the first match index or -1."""
    pat = a[0] if a else ""
    rx = pat.regex if isinstance(pat, _RegExp) else _re.compile(
        _re.escape(_to_str(pat)))
    m = rx.search(s)
    return float(m.start()) if m else -1.0


def _arr_index_of(l: list, a: list, last: bool = False) -> float:
    """Array.prototype.indexOf / lastIndexOf (ES5 15.4.4.14-15): strict
    equality, optional fromIndex (negative counts from the end)."""
    if not a:
        return -1.0
    x, n = a[0], len(l)
    if last:
        frm = n - 1
        if len(a) > 1:
            frm = _js_int((a[1]))
            if frm < 0:
                frm += n
            frm = min(frm, n - 1)
        rng = range(frm, -1, -1)
    else:
        frm = 0
        if len(a) > 1:
            frm = _js_int((a[1]))
            if frm < 0:
                frm = max(0, n + frm)
        rng = range(frm, n)
    for i in rng:
        if Interpreter._strict_eq(l[i], x):
            return float(i)
    return -1.0


def _str_last_index_of(s: str, a: list) -> float:
    """String.prototype.lastIndexOf with the position argument (ES5
    15.5.4.8): rightmost match whose START is ≤ position."""
    sub = _to_str(a[0]) if a else "undefined"
    pos = len(s)
    if len(a) > 1 and not (isinstance(a[1], float) and math.isnan(a[1])):
        pos = max(0, _js_int((a[1])))
    return float(s.rfind(sub, 0, pos + len(sub)))


def _splice(lst: list, a: list) -> list:
    """Array.prototype.splice (ES5 15.4.4.12): mutates in place, returns
    the removed elements; negative start counts from the end, an omitted
    deleteCount deletes through the end."""
    n = len(lst)
    start = _js_int((a[0])) if a else 0
    start = max(n + start, 0) if start < 0 else min(start, n)
    if len(a) > 1:
        count = max(0, min(_js_int((a[1])), n - start))
    else:
        count = n - start
    removed = lst[start:start + count]
    lst[start:start + count] = list(a[2:])
    return removed


def _num_to_string(x: float, a: list) -> str:
    """Number.prototype.toString with optional radix (integers only for
    radix != 10; fractional radix conversion fails loudly)."""
    radix = _js_int((a[0])) if a else 10
    if radix == 10:
        return _to_str(x)
    if not 2 <= radix <= 36:
        raise _Thrown({"name": "RangeError",
                       "message": "toString() radix must be between 2 and 36"})
    if math.isnan(x) or math.isinf(x) or x != int(x):
        raise MiniJsError("toString(radix) supports integers only")
    n = int(x)
    if n == 0:
        return "0"
    sign = "-" if n < 0 else ""
    n = abs(n)
    digits = "0123456789abcdefghijklmnopqrstuvwxyz"
    out = []
    while n:
        n, r = divmod(n, radix)
        out.append(digits[r])
    return sign + "".join(reversed(out))


def _own_keys(v: dict, it=None, all_props: bool = False) -> list:
    """Own keys in every engine's de-facto order: integer-like keys
    ascending first, then the rest in insertion order; skips
    non-enumerable keys unless ``all_props``."""
    ne = it._nonenum_of(v) if (it is not None and not all_props) else ()
    ints, rest = [], []
    for k in v.keys():
        if k in ne:
            continue
        if k.isascii() and k.isdigit() and (k == "0" or k[0] != "0"):
            ints.append(k)
        else:
            rest.append(k)
    ints.sort(key=int)
    return ints + rest


def _object_keys(v, it=None, all_props: bool = False) -> list:
    if isinstance(v, dict):
        return _own_keys(v, it, all_props)
    if isinstance(v, list):  # array indices as strings (ES5 15.2.3.14)
        out = [str(i) for i in range(len(v)) if v[i] is not HOLE]
        lp = it._list_props_of(v) if it is not None else None
        if lp:
            out.extend(lp.keys())
        return out
    return []


def _fmt_digits(v, lo: int, hi: int, name: str) -> int:
    """Digit-count argument of toFixed/toPrecision/toExponential:
    out-of-range throws a CATCHABLE RangeError (ES5 15.7.4.5-7), not a
    Python formatting error."""
    d = _js_int(v)
    if not lo <= d <= hi:
        raise _Thrown({"name": "RangeError",
                       "message": f"{name}() argument must be between "
                                  f"{lo} and {hi}"})
    return d


def _js_to_fixed(x: float, digits: int) -> str:
    """Number.prototype.toFixed (ES5 15.7.4.5): round the EXACT binary
    value (so (1.45).toFixed(1) is '1.4' — 1.45 stores below the tie),
    exact ties away from zero ((2.5).toFixed(0) → '3'); |x| ≥ 1e21
    falls back to ToString."""
    import decimal

    if math.isnan(x):
        return "NaN"
    if math.isinf(x) or abs(x) >= 1e21:
        return _to_str(x)
    q = decimal.Decimal(x).quantize(
        decimal.Decimal(1).scaleb(-digits), rounding=decimal.ROUND_HALF_UP)
    return f"{q:.{digits}f}"


def _js_floorceil(v: float, f) -> float:
    if math.isnan(v) or math.isinf(v):
        return v
    r = float(f(v))
    if r == 0.0 and math.copysign(1.0, v) < 0:
        return -0.0  # ceil(-0.3) and floor(-0) are -0 (ES5 15.8.2)
    return r


def _js_safe(f, *args) -> float:
    """Math.* transcendental wrapper: domain errors and NaN inputs
    return NaN (Python raises ValueError where JS returns NaN)."""
    try:
        if any(math.isnan(x) for x in args):
            return math.nan
        return float(f(*args))
    except (ValueError, OverflowError):
        return math.nan


def _js_log(v: float, f) -> float:
    if math.isnan(v) or v < 0:
        return math.nan
    if v == 0:
        return -math.inf
    return f(v)


def _js_sqrt(v: float) -> float:
    if math.isnan(v) or v < 0:
        return math.nan
    return math.sqrt(v)


def _js_pow(x: float, y: float) -> float:
    """Math.pow (ES5 15.8.2.13): y NaN -> NaN (Python returns 1 for
    1**nan / nan**0), y ±0 -> 1 even for NaN base, 0 ** negative -> ±∞
    (Python raises)."""
    if math.isnan(y):
        return math.nan
    if y == 0:
        return 1.0
    if abs(x) == 1 and math.isinf(y):
        return math.nan  # (±1) ** ±∞ is NaN (ES5 15.8.2.13)
    if x == 0 and y < 0:
        neg = math.copysign(1.0, x) < 0 and (y == int(y)
                                             and int(y) % 2 != 0)
        return -math.inf if neg else math.inf
    try:
        r = x ** y
    except OverflowError:
        return math.inf if (x > 1 or x < -1) == (y > 0) else 0.0
    return float(r) if not isinstance(r, complex) else math.nan


def _js_mod(x: float, y: float) -> float:
    """JS % (ES5 11.5.3): NaN when the dividend is ±∞ or the divisor
    is 0/NaN; the dividend when the divisor is ±∞; sign of dividend."""
    if math.isnan(x) or math.isnan(y) or math.isinf(x) or y == 0:
        return math.nan
    if math.isinf(y):
        return x
    return math.fmod(x, y)


def _js_round(v: float) -> float:
    """Math.round (ES5 15.8.2.15): floor(x + 0.5), with NaN/±∞
    passthrough and −0 for inputs in [−0.5, −0)."""
    if math.isnan(v) or math.isinf(v):
        return v
    r = float(math.floor(v + 0.5))
    if r == 0.0 and math.copysign(1.0, v) < 0:
        return -0.0
    return r


def _js_minmax(a: list, empty: float, pick) -> float:
    """Math.max/min: the identity (−∞ for max, +∞ for min) on no
    args, NaN if ANY arg is NaN."""
    vals = [_num(x) for x in a]
    if not vals:
        return empty
    if any(math.isnan(v) for v in vals):
        return math.nan
    r = float(pick(vals))
    if r == 0.0:
        # signed-zero ties: min prefers -0, max prefers +0 (15.8.2.11)
        negs = [math.copysign(1.0, v) < 0 for v in vals if v == 0.0]
        if pick is min and any(negs):
            return -0.0
        if pick is max and not all(negs):
            return 0.0
    return r


def _object_create(it, a):
    """Object.create(proto[, properties]) (ES5 15.2.3.5): proto may be
    null (the result then skips the Object.prototype fallback); the
    optional second argument is a descriptor map routed through
    defineProperty (enumerable defaults FALSE there)."""
    proto = a[0] if a and isinstance(a[0], dict) else None
    o = _JsObject(proto=proto, null_proto=bool(a) and a[0] is None)
    if len(a) > 1 and isinstance(a[1], dict):
        for k, desc in a[1].items():
            if isinstance(desc, dict):
                _define_property(it, [o, k, desc])
    return o


def _function_ctor(it, a):
    """The Function constructor (ES5 15.3.2.1): Function(p1, …, body)
    parses the body with the engine's own parser and closes over the
    GLOBAL scope only (never the caller's). This is the eval-shaped
    entry real ES5 libraries use for global detection
    (Function('return this')()) and template compilation."""
    if not a:
        params, body_src = [], ""
    else:
        params = []
        for p in a[:-1]:
            params.extend(x.strip() for x in _to_str(p).split(",")
                          if x.strip())
        body_src = _to_str(a[-1])
    body = _Parser(_tokenize(body_src)).program()
    genv = getattr(it, "global_env", None)
    if genv is None:
        genv = {}
    return _Function(params, body, genv)


def _error_ctor(name: str) -> "_Callable":
    return _Callable(
        lambda it, a, _n=name: {"name": _n,
                                "message": _to_str(a[0]) if a else ""},
        name=name)


_ERROR_NAMES = ("Error", "TypeError", "RangeError", "SyntaxError")

# JS encodeURIComponent unescaped set: A-Za-z0-9 - _ . ! ~ * ' ( )
_URI_COMPONENT_SAFE = "!'()*-._~"
# encodeURI additionally leaves the URI reserved set intact
_URI_SAFE = "!#$&'()*+,-./:;=?@_~"


_GLOBALS = {
    "Math": {
        "floor": lambda it, a: _js_floorceil(_num(a[0]), math.floor),
        "ceil": lambda it, a: _js_floorceil(_num(a[0]), math.ceil),
        "round": lambda it, a: _js_round(_num(a[0])),
        "abs": lambda it, a: abs(_num(a[0])),
        "max": lambda it, a: _js_minmax(a, -math.inf, max),
        "min": lambda it, a: _js_minmax(a, math.inf, min),
        "pow": lambda it, a: _js_pow(_num(a[0]), _num(a[1])),
        "sqrt": lambda it, a: _js_sqrt(_num(a[0])),
        # deterministic PRNG (same replayability doctrine as the Date
        # clock: a data-plane plugin must be replayable, so randomness
        # is a per-Interpreter xorshift stream, never an ambient read)
        "random": lambda it, a: it._next_random(),
        "log": lambda it, a: _js_log(_num(a[0]), math.log),
        "exp": lambda it, a: _js_safe(math.exp, _num(a[0])),
        "sin": lambda it, a: _js_safe(math.sin, _num(a[0])),
        "cos": lambda it, a: _js_safe(math.cos, _num(a[0])),
        "tan": lambda it, a: _js_safe(math.tan, _num(a[0])),
        "asin": lambda it, a: _js_safe(math.asin, _num(a[0])),
        "acos": lambda it, a: _js_safe(math.acos, _num(a[0])),
        "atan": lambda it, a: _js_safe(math.atan, _num(a[0])),
        "atan2": lambda it, a: _js_safe(math.atan2, _num(a[0]),
                                        _num(a[1])),
        "PI": math.pi,
        "E": math.e,
        "LN2": math.log(2),
        "LN10": math.log(10),
        "LOG2E": 1 / math.log(2),
        "LOG10E": 1 / math.log(10),
        "SQRT2": math.sqrt(2),
        "SQRT1_2": math.sqrt(0.5),
    },
    "JSON": {
        "parse": lambda it, a: _json_parse_full(it, a),
        "stringify": lambda it, a: _json_stringify_full(it, a),
    },
    "Object": _Callable(
        lambda it, a: a[0] if a else {},
        props={
            "keys": lambda it, a: _object_keys(a[0], it),
            "getOwnPropertyNames": lambda it, a: _object_keys(
                a[0], it, all_props=True),
            "getPrototypeOf": lambda it, a: (
                it._function_proto
                if isinstance(a[0], (_Function, _Callable, _Bound,
                                     _NativeThis))
                or (callable(a[0]) and not isinstance(a[0], dict))
                else getattr(a[0], "proto", None)),
            "create": lambda it, a: _object_create(it, a),
            "defineProperty": lambda it, a: _define_property(it, a),
            "freeze": lambda it, a: it._set_integrity(a[0], "freeze"),
            "seal": lambda it, a: it._set_integrity(a[0], "seal"),
            "preventExtensions": lambda it, a: it._set_integrity(
                a[0], "prevent"),
            "isFrozen": lambda it, a: it._integrity_of(a[0]) == "freeze",
            "isSealed": lambda it, a: it._integrity_of(a[0])
            in ("seal", "freeze"),
            "isExtensible": lambda it, a: isinstance(a[0], (dict, list))
            and it._integrity_of(a[0]) is None,
            "prototype": _OBJECT_PROTO,
        },
        name="Object",
    ),
    "Array": _Callable(
        lambda it, a: list(a),
        props={
            "isArray": lambda it, a: isinstance(a[0], list),
            "prototype": _ARRAY_PROTO,
        },
        name="Array",
    ),
    "String": _Callable(
        lambda it, a: _to_str(it._to_primitive(a[0], "string"))
        if a else "",
        props={
            "fromCharCode": lambda it, a: "".join(
                chr(_js_int((x)) & 0xFFFF) for x in a),
        },
        name="String",
    ),
    "Number": _Callable(
        lambda it, a: _num(a[0]) if a else 0.0,
        props={
            "MAX_VALUE": 1.7976931348623157e308,
            "MIN_VALUE": 5e-324,
            "POSITIVE_INFINITY": math.inf,
            "NEGATIVE_INFINITY": -math.inf,
            "NaN": math.nan,
        },
        name="Number"),
    "Error": _error_ctor("Error"),
    "TypeError": _error_ctor("TypeError"),
    "RangeError": _error_ctor("RangeError"),
    "SyntaxError": _error_ctor("SyntaxError"),
    "RegExp": _Callable(
        lambda it, a: _RegExp(_to_str(a[0]) if a else "",
                              _to_str(a[1]) if len(a) > 1 else ""),
        name="RegExp",
    ),
    "Function": _Callable(
        lambda it, a: _function_ctor(it, a),
        name="Function",  # .prototype resolves per-interpreter in
        # _member (a module-level singleton would let one script's
        # Function.prototype writes leak into every later script)
    ),
    "Boolean": _Callable(
        lambda it, a: _truthy(a[0]) if a else False,
        name="Boolean",
    ),
    "Date": _Callable(
        lambda it, a: _iso_ms(it.now_ms),
        props={
            "now": lambda it, a: it.now_ms,
            "parse": lambda it, a: _date_parse(_to_str(a[0]) if a
                                               else ""),
            "UTC": lambda it, a: _date_utc(a),
        },
        name="Date",
    ),
    "encodeURIComponent": lambda it, a: urllib.parse.quote(
        _to_str(a[0]) if a else "undefined", safe=_URI_COMPONENT_SAFE),
    "encodeURI": lambda it, a: urllib.parse.quote(
        _to_str(a[0]) if a else "undefined", safe=_URI_SAFE),
    "decodeURIComponent": lambda it, a: urllib.parse.unquote(
        _to_str(a[0]) if a else "undefined"),
    "parseInt": lambda it, a: _parse_int(a),
    "parseFloat": lambda it, a: _parse_float(a),
    "isNaN": lambda it, a: isinstance(_num(a[0]), float)
    and math.isnan(_num(a[0])),
    "isFinite": lambda it, a: math.isfinite(_num(a[0])),
    "NaN": math.nan,
    "Infinity": math.inf,
}


def _date_parse(s: str) -> float:
    """Date.parse (ES5 15.9.4.2): the ISO 8601 interchange format only
    (date-only, date+time, optional .ms and Z/±HH:MM offset; a bare
    'T'-less space separator accepted as a common extension). → epoch
    ms, NaN on anything else."""
    import datetime

    m = _re.match(
        r"^(\d{4})(?:-(\d{2})(?:-(\d{2}))?)?"
        r"(?:[T ](\d{2}):(\d{2})(?::(\d{2})(?:\.(\d{1,3}))?)?"
        r"(Z|[+-]\d{2}:?\d{2})?)?$", s.strip())
    if not m:
        return math.nan
    y, mo, d, h, mi, sec, ms, tz = m.groups()
    try:
        dt = datetime.datetime(int(y), int(mo or 1), int(d or 1),
                               int(h or 0), int(mi or 0), int(sec or 0),
                               tzinfo=datetime.timezone.utc)
    except ValueError:
        return math.nan
    t = dt.timestamp() * 1000.0 + float((ms or "0").ljust(3, "0"))
    if tz and tz != "Z":
        sign = 1.0 if tz[0] == "+" else -1.0
        t -= sign * (int(tz[1:3]) * 60 + int(tz[-2:])) * 60000.0
    return t


def _date_utc(a: list) -> float:
    """Date.UTC(year, month[, day, h, m, s, ms]) → epoch ms (ES5
    15.9.4.3) with full MakeDay/MakeTime overflow normalization
    (month 12 → January next year, day 0 → last of prior month, …);
    NaN only when a field is NaN or the result leaves the datetime
    range."""
    import datetime

    if len(a) < 2:
        return math.nan
    vals = [_num(x) for x in a[:7]]
    if any(math.isnan(v) or math.isinf(v) for v in vals):
        return math.nan
    g = [int(v) for v in vals] + [0] * (7 - min(len(a), 7))
    year, month = g[0] + g[1] // 12, g[1] % 12
    day = g[2] if len(a) > 2 else 1
    try:
        base = datetime.datetime(year, month + 1, 1,
                                 tzinfo=datetime.timezone.utc)
        dt = base + datetime.timedelta(days=day - 1, hours=g[3],
                                       minutes=g[4], seconds=g[5])
    except (ValueError, OverflowError):
        return math.nan
    return dt.timestamp() * 1000.0 + float(g[6])


def _iso_ms(ms: float) -> str:
    import datetime

    dt = datetime.datetime.fromtimestamp(ms / 1000.0, datetime.timezone.utc)
    return dt.strftime("%Y-%m-%dT%H:%M:%S.") + f"{int(ms) % 1000:03d}Z"


_DATE_FIELDS = ("FullYear", "Month", "Date", "Day", "Hours", "Minutes",
                "Seconds", "Milliseconds")


def _date_object(ms: float) -> dict:
    """A Date instance: a dict of closures over ONE mutable [ms] cell,
    so setters (ES5 15.9.5.28-40) recompute every getter. Invalid
    Dates (NaN time value) report NaN fields and 'Invalid Date'
    strings but keep their setters — setting a valid time revives
    them, as in JS. The engine's clock is UTC, so local getters and
    setters alias the UTC ones."""
    import datetime

    cell = [float(ms)]

    def field(name: str) -> float:
        v = cell[0]
        if math.isnan(v):
            return math.nan
        dt = datetime.datetime.fromtimestamp(v / 1000.0,
                                             datetime.timezone.utc)
        return {"FullYear": float(dt.year),
                "Month": float(dt.month - 1),  # 0-based (15.9.1.4)
                "Date": float(dt.day),
                "Day": float(dt.isoweekday() % 7),  # 0 = Sunday
                "Hours": float(dt.hour),
                "Minutes": float(dt.minute),
                "Seconds": float(dt.second),
                "Milliseconds": float(int(v) % 1000)}[name]

    def set_fields(first: str, args: list) -> float:
        """set<first>(...) also consumes the trailing finer fields
        (e.g. setUTCFullYear(y, mo, d) — ES5 15.9.5.40)."""
        order = ["FullYear", "Month", "Date", "Hours", "Minutes",
                 "Seconds", "Milliseconds"]
        vals = {f: field(f) for f in order}
        if math.isnan(cell[0]):
            # reviving an Invalid Date: unset fields default per MakeDay
            vals = {"FullYear": math.nan, "Month": 0.0, "Date": 1.0,
                    "Hours": 0.0, "Minutes": 0.0, "Seconds": 0.0,
                    "Milliseconds": 0.0}
        start = order.index(first)
        for off, v in enumerate(args):
            if start + off >= len(order):
                break  # extra args ignored (JS)
            vals[order[start + off]] = _num(v)
        if any(math.isnan(v) or math.isinf(v) for v in vals.values()):
            cell[0] = math.nan
            return math.nan
        cell[0] = _date_utc([vals["FullYear"], vals["Month"],
                             vals["Date"], vals["Hours"], vals["Minutes"],
                             vals["Seconds"], vals["Milliseconds"]])
        return cell[0]

    def to_str() -> str:
        if math.isnan(cell[0]):
            return "Invalid Date"
        return _iso_ms(cell[0])

    out = {
        "toISOString": lambda it, a: to_str(),
        "toString": lambda it, a: to_str(),
        "getTime": lambda it, a: cell[0],
        "valueOf": lambda it, a: cell[0],
        "setTime": lambda it, a: cell.__setitem__(
            0, _num(a[0]) if a else math.nan) or cell[0],
        "getTimezoneOffset": lambda it, a: (math.nan
                                            if math.isnan(cell[0])
                                            else 0.0),
    }
    for f in _DATE_FIELDS:
        out[f"get{f}"] = lambda it, a, _f=f: field(_f)
        out[f"getUTC{f}"] = lambda it, a, _f=f: field(_f)
        if f != "Day":
            out[f"set{f}"] = lambda it, a, _f=f: set_fields(_f, a)
            out[f"setUTC{f}"] = lambda it, a, _f=f: set_fields(_f, a)
    return out


_INT_DIGITS = "0123456789abcdefghijklmnopqrstuvwxyz"


def _parse_int(a):
    s = _to_str(a[0]).strip()
    radix = _js_int((a[1])) if len(a) > 1 and _truthy(a[1]) else 0
    if radix and not 2 <= radix <= 36:
        return math.nan
    sign = 1
    if s[:1] in ("+", "-"):
        sign = -1 if s[0] == "-" else 1
        s = s[1:]
    if radix in (0, 16) and s[:2].lower() == "0x":
        s, radix = s[2:], 16  # auto-hex (ES5 15.1.2.2 step 10)
    radix = radix or 10
    digits = ""
    for c in s.lower():
        if c in _INT_DIGITS[:radix]:
            digits += c
        else:
            break
    return float(sign * int(digits, radix)) if digits else math.nan


def _parse_float(a):
    s = _to_str(a[0]).strip()
    m = _re.match(r"[+-]?(Infinity|(\d+\.?\d*|\.\d+)([eE][+-]?\d+)?)", s)
    if not m:
        return math.nan
    tok = m.group(0)
    if tok.endswith("Infinity"):
        return -math.inf if tok[0] == "-" else math.inf
    return float(tok)


def run_script(src: str, params: dict | None = None, max_ops: int = 500_000,
               now_ms: float = 0.0):
    """Public entry: run a plugin script with ``params`` bound.
    ``now_ms`` seeds the deterministic Date clock."""
    return Interpreter(max_ops=max_ops, now_ms=now_ms).run(src, params)
