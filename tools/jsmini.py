"""A minimal ECMAScript-subset interpreter — enough to EXECUTE app.js.

The image ships no JS engine (no node/quickjs/duktape — VERDICT r4 item
6), yet the dashboard's pure data→fragment layer
(`radio_mapper_tpu/webapp/static/app.js`) should not merely be
regex-contract-tested: a rendering regression (wrong field, broken
template, bad arithmetic) would pass structural checks. This module
interprets the small, deliberately-pure subset that layer is written in,
so CI runs every exported function against the same injected-state JSON
the contract tests use and asserts the actual rendered fragments
(tests/test_webapp_js_exec.py).

Supported subset (everything app.js uses, a little margin, nothing more):
  - function declarations, const/let, if/else, classic for(;;), return,
    blocks, expression statements
  - ternary, || && (value-returning), === !== == !=, < > <= >=,
    + - * / %, unary ! - +, postfix ++/--, assignment (=, +=)
  - member access (.name, [expr]), calls, array/object literals,
    template literals with ${...}, arrow functions, `new Date(...)`
  - JS semantics where they matter: undefined vs null, truthiness,
    NaN-propagating numeric coercion, string concatenation via +,
    JS number→string formatting (integers render without a decimal)
  - builtins: Math.{floor,round,cos,sin,PI}, isNaN, Date (ISO parse,
    numeric coercion to epoch ms, toLocaleDateString), Number.toFixed,
    String.toUpperCase, Array.{filter,join,push,length}

NOT a general JS engine: no prototypes, classes, closures-over-mutation
edge cases, async, regex, exceptions, or `this`. Unknown syntax raises.
"""

from __future__ import annotations

import math
import re as _re
from datetime import datetime


class JSError(Exception):
    pass


class _Undefined:
    _inst = None

    def __new__(cls):
        if cls._inst is None:
            cls._inst = super().__new__(cls)
        return cls._inst

    def __repr__(self):
        return "undefined"


UNDEFINED = _Undefined()
NAN = float("nan")


class JSDate:
    """Date carrying epoch milliseconds (NaN when unparseable)."""

    def __init__(self, ms: float):
        self.ms = ms

    def toLocaleDateString(self):
        if math.isnan(self.ms):
            return "Invalid Date"
        d = datetime.utcfromtimestamp(self.ms / 1000.0)
        return f"{d.month}/{d.day}/{d.year}"

    @staticmethod
    def parse(value):
        if isinstance(value, (int, float)):
            return JSDate(float(value))
        if not isinstance(value, str):
            return JSDate(NAN)
        s = value.strip()
        try:
            return JSDate(
                datetime.fromisoformat(s.replace("Z", "+00:00")).timestamp() * 1000.0
            )
        except ValueError:
            return JSDate(NAN)


# ---------------------------------------------------------------- lexer

_TOKEN_RE = _re.compile(
    r"""
    (?P<ws>\s+|//[^\n]*|/\*.*?\*/)
  | (?P<num>\d+\.\d*|\.\d+|\d+)
  | (?P<name>[A-Za-z_$][\w$]*)
  | (?P<template>`)
  | (?P<str>'(?:\\.|[^'\\])*'|"(?:\\.|[^"\\])*")
  | (?P<punct>===|!==|==|!=|<=|>=|&&|\|\||=>|\+\+|--|\+=|-=|[{}()\[\].,;:?<>+\-*/%!=])
    """,
    _re.X | _re.S,
)

_STR_ESCAPES = {"n": "\n", "t": "\t", "'": "'", '"': '"', "\\": "\\", "`": "`", "$": "$"}


def _unescape(body: str) -> str:
    out, i = [], 0
    while i < len(body):
        c = body[i]
        if c == "\\" and i + 1 < len(body):
            out.append(_STR_ESCAPES.get(body[i + 1], body[i + 1]))
            i += 2
        else:
            out.append(c)
            i += 1
    return "".join(out)


def tokenize(src: str):
    """Token list of (kind, value). Template literals become
    ('template', [part, ...]) with str parts and ('expr', tokens) parts."""
    toks, i = [], 0
    while i < len(src):
        m = _TOKEN_RE.match(src, i)
        if not m:
            raise JSError(f"lex error at {src[i:i+30]!r}")
        if m.lastgroup == "ws":
            i = m.end()
            continue
        if m.lastgroup == "template":
            i = m.end()
            parts, buf = [], []
            while True:
                if i >= len(src):
                    raise JSError("unterminated template literal")
                c = src[i]
                if c == "`":
                    i += 1
                    break
                if c == "\\":
                    buf.append(_STR_ESCAPES.get(src[i + 1], src[i + 1]))
                    i += 2
                    continue
                if c == "$" and i + 1 < len(src) and src[i + 1] == "{":
                    parts.append("".join(buf))
                    buf = []
                    depth, j = 1, i + 2
                    while depth:
                        if src[j] == "{":
                            depth += 1
                        elif src[j] == "}":
                            depth -= 1
                        elif src[j] == "`":
                            # nested template: skip to its end (no nesting
                            # of ${} inside nested templates supported)
                            j = src.index("`", j + 1)
                        j += 1
                    parts.append(("expr", tokenize(src[i + 2 : j - 1])))
                    i = j
                    continue
                buf.append(c)
                i += 1
            parts.append("".join(buf))
            toks.append(("template", parts))
            continue
        kind, val = m.lastgroup, m.group()
        if kind == "num":
            toks.append(("num", float(val)))
        elif kind == "str":
            toks.append(("str", _unescape(val[1:-1])))
        else:
            toks.append((kind, val))
        i = m.end()
    return toks


# --------------------------------------------------------------- parser
#
# AST: tuples (tag, ...). Statements and expressions share the namespace.


class _Parser:
    def __init__(self, toks):
        self.toks = toks
        self.i = 0

    def peek(self, k=0):
        j = self.i + k
        return self.toks[j] if j < len(self.toks) else ("eof", None)

    def next(self):
        t = self.peek()
        self.i += 1
        return t

    def eat(self, kind, val=None):
        t = self.next()
        if t[0] != kind or (val is not None and t[1] != val):
            raise JSError(f"expected {val or kind}, got {t}")
        return t

    def at(self, kind, val=None):
        t = self.peek()
        return t[0] == kind and (val is None or t[1] == val)

    # ---- statements

    def program(self):
        fns = {}
        while not self.at("eof"):
            if self.at("name", "function"):
                name, fn = self.funcdecl()
                fns[name] = fn
            else:
                raise JSError(f"top level must be function declarations, got {self.peek()}")
        return fns

    def funcdecl(self):
        self.eat("name", "function")
        name = self.eat("name")[1]
        params = self.paramlist()
        body = self.block()
        return name, ("func", params, body)

    def paramlist(self):
        self.eat("punct", "(")
        params = []
        while not self.at("punct", ")"):
            params.append(self.eat("name")[1])
            if self.at("punct", ","):
                self.next()
        self.eat("punct", ")")
        return params

    def block(self):
        self.eat("punct", "{")
        stmts = []
        while not self.at("punct", "}"):
            stmts.append(self.statement())
        self.eat("punct", "}")
        return ("block", stmts)

    def statement(self):
        if self.at("punct", "{"):
            return self.block()
        if self.at("name", "const") or self.at("name", "let") or self.at("name", "var"):
            self.next()
            decls = []
            while True:
                n = self.eat("name")[1]
                init = None
                if self.at("punct", "="):
                    self.next()
                    init = self.assignment()
                decls.append((n, init))
                if self.at("punct", ","):
                    self.next()
                    continue
                break
            self._semi()
            return ("decl", decls)
        if self.at("name", "return"):
            self.next()
            e = None
            if not self.at("punct", ";") and not self.at("punct", "}"):
                e = self.expression()
            self._semi()
            return ("return", e)
        if self.at("name", "if"):
            self.next()
            self.eat("punct", "(")
            cond = self.expression()
            self.eat("punct", ")")
            then = self.statement()
            other = None
            if self.at("name", "else"):
                self.next()
                other = self.statement()
            return ("if", cond, then, other)
        if self.at("name", "for"):
            self.next()
            self.eat("punct", "(")
            init = None
            if not self.at("punct", ";"):
                init = self.statement()  # consumes its ';' via decl/expr
            else:
                self.next()
            cond = None if self.at("punct", ";") else self.expression()
            self.eat("punct", ";")
            upd = None if self.at("punct", ")") else self.expression()
            self.eat("punct", ")")
            body = self.statement()
            return ("for", init, cond, upd, body)
        e = self.expression()
        self._semi()
        return ("expr", e)

    def _semi(self):
        if self.at("punct", ";"):
            self.next()

    # ---- expressions (precedence climbing)

    def expression(self):
        return self.assignment()

    def assignment(self):
        # arrow functions: NAME => ... or (a, b) => ...
        arrow = self._try_arrow()
        if arrow is not None:
            return arrow
        left = self.ternary()
        if self.at("punct", "=") or self.at("punct", "+=") or self.at("punct", "-="):
            op = self.next()[1]
            right = self.assignment()
            return ("assign", op, left, right)
        return left

    def _try_arrow(self):
        save = self.i
        t = self.peek()
        if t[0] == "name" and self.peek(1) == ("punct", "=>"):
            name = self.next()[1]
            self.next()
            return ("func", [name], ("return_expr", self.assignment()))
        if t == ("punct", "("):
            try:
                params = self.paramlist()
                if self.at("punct", "=>"):
                    self.next()
                    if self.at("punct", "{"):
                        return ("func", params, self.block())
                    return ("func", params, ("return_expr", self.assignment()))
            except JSError:
                pass
            self.i = save
        return None

    def ternary(self):
        cond = self.logic_or()
        if self.at("punct", "?"):
            self.next()
            a = self.assignment()
            self.eat("punct", ":")
            b = self.assignment()
            return ("ternary", cond, a, b)
        return cond

    def _binop(self, sub, ops):
        left = sub()
        while self.peek()[0] == "punct" and self.peek()[1] in ops:
            op = self.next()[1]
            left = ("binop", op, left, sub())
        return left

    def logic_or(self):
        return self._binop(self.logic_and, ("||",))

    def logic_and(self):
        return self._binop(self.equality, ("&&",))

    def equality(self):
        return self._binop(self.relational, ("===", "!==", "==", "!="))

    def relational(self):
        return self._binop(self.additive, ("<", ">", "<=", ">="))

    def additive(self):
        return self._binop(self.multiplicative, ("+", "-"))

    def multiplicative(self):
        return self._binop(self.unary, ("*", "/", "%"))

    def unary(self):
        if self.peek()[0] == "punct" and self.peek()[1] in ("!", "-", "+"):
            op = self.next()[1]
            return ("unary", op, self.unary())
        return self.postfix()

    def postfix(self):
        e = self.callmember()
        if self.at("punct", "++") or self.at("punct", "--"):
            op = self.next()[1]
            return ("postfix", op, e)
        return e

    def callmember(self):
        e = self.primary()
        while True:
            if self.at("punct", "."):
                self.next()
                e = ("member", e, ("str", self.eat("name")[1]))
            elif self.at("punct", "["):
                self.next()
                idx = self.expression()
                self.eat("punct", "]")
                e = ("member", e, idx)
            elif self.at("punct", "("):
                e = ("call", e, self.arglist())
            else:
                return e

    def arglist(self):
        self.eat("punct", "(")
        args = []
        while not self.at("punct", ")"):
            args.append(self.assignment())
            if self.at("punct", ","):
                self.next()
        self.eat("punct", ")")
        return args

    def primary(self):
        t = self.peek()
        if t[0] == "num":
            self.next()
            return ("num", t[1])
        if t[0] == "str":
            self.next()
            return ("str", t[1])
        if t[0] == "template":
            self.next()
            parts = []
            for p in t[1]:
                if isinstance(p, str):
                    parts.append(("str", p))
                else:
                    parts.append(_Parser(p[1]).expression())
            return ("template", parts)
        if t == ("name", "true"):
            self.next()
            return ("bool", True)
        if t == ("name", "false"):
            self.next()
            return ("bool", False)
        if t == ("name", "null"):
            self.next()
            return ("null",)
        if t == ("name", "undefined"):
            self.next()
            return ("undef",)
        if t == ("name", "new"):
            self.next()
            ctor = self.eat("name")[1]
            return ("new", ctor, self.arglist())
        if t[0] == "name":
            self.next()
            return ("var", t[1])
        if t == ("punct", "("):
            self.next()
            e = self.expression()
            self.eat("punct", ")")
            return e
        if t == ("punct", "["):
            self.next()
            items = []
            while not self.at("punct", "]"):
                items.append(self.assignment())
                if self.at("punct", ","):
                    self.next()
            self.eat("punct", "]")
            return ("array", items)
        if t == ("punct", "{"):
            self.next()
            props = []
            while not self.at("punct", "}"):
                k = self.next()
                if k[0] not in ("name", "str"):
                    raise JSError(f"bad object key {k}")
                self.eat("punct", ":")
                props.append((k[1], self.assignment()))
                if self.at("punct", ","):
                    self.next()
            self.eat("punct", "}")
            return ("object", props)
        raise JSError(f"unexpected token {t}")


# ------------------------------------------------------------ evaluator


def to_number(v):
    if isinstance(v, bool):
        return 1.0 if v else 0.0
    if isinstance(v, (int, float)):
        return float(v)
    if v is None:
        return 0.0
    if v is UNDEFINED:
        return NAN
    if isinstance(v, str):
        s = v.strip()
        if not s:
            return 0.0
        try:
            return float(s)
        except ValueError:
            return NAN
    if isinstance(v, JSDate):
        return v.ms
    return NAN


def truthy(v):
    if isinstance(v, bool):
        return v
    if v is None or v is UNDEFINED:
        return False
    if isinstance(v, (int, float)):
        return not (v == 0 or math.isnan(v))
    if isinstance(v, str):
        return len(v) > 0
    return True  # objects, arrays, dates, functions


def js_str(v):
    if v is UNDEFINED:
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
        if v == int(v) and abs(v) < 1e21:
            return str(int(v))
        return repr(v)
    if isinstance(v, int):
        return str(v)
    if isinstance(v, str):
        return v
    if isinstance(v, list):
        return ",".join("" if x in (None, UNDEFINED) else js_str(x) for x in v)
    if isinstance(v, dict):
        return "[object Object]"
    if isinstance(v, JSDate):
        return v.toLocaleDateString()
    return str(v)


def _to_fixed(x, digits):
    n = to_number(x)
    if math.isnan(n):
        return "NaN"
    d = int(digits)
    # JS rounds half away from zero at the printed digit
    scaled = n * (10 ** d)
    r = math.floor(scaled + 0.5) if scaled >= 0 else math.ceil(scaled - 0.5)
    out = r / (10 ** d)
    return f"{out:.{d}f}"


class _Return(Exception):
    def __init__(self, value):
        self.value = value


class JSFunction:
    def __init__(self, params, body, env, interp):
        self.params, self.body, self.env, self.interp = params, body, env, interp

    def __call__(self, *args):
        local = dict(self.env)
        for k, p in enumerate(self.params):
            local[p] = args[k] if k < len(args) else UNDEFINED
        if self.body[0] == "return_expr":
            return self.interp.eval(self.body[1], local)
        try:
            self.interp.exec_stmt(self.body, local)
        except _Return as r:
            return r.value
        return UNDEFINED


class Interp:
    """Interpret a source of top-level function declarations."""

    def __init__(self, source: str):
        self.globals = {
            "Math": {
                "floor": lambda x: float(math.floor(to_number(x))),
                "round": lambda x: float(math.floor(to_number(x) + 0.5)),
                "cos": lambda x: math.cos(to_number(x)),
                "sin": lambda x: math.sin(to_number(x)),
                "abs": lambda x: abs(to_number(x)),
                "PI": math.pi,
            },
            "isNaN": lambda x: math.isnan(to_number(x)),
            "Number": lambda x=UNDEFINED: to_number(x),
            "String": lambda x=UNDEFINED: js_str(x),
        }
        fns = _Parser(tokenize(source)).program()
        self.functions = {}
        for name, (_, params, body) in fns.items():
            self.functions[name] = JSFunction(params, body, self.globals, self)
        self.globals.update(self.functions)

    def call(self, name: str, *args):
        """Call a top-level function with Python values (dicts/lists/str/
        float/None); returns Python values (UNDEFINED for undefined)."""
        if name not in self.functions:
            raise JSError(f"no function {name!r}")
        return self.functions[name](*args)

    # ---- statements

    def exec_stmt(self, node, env):
        tag = node[0]
        if tag == "block":
            for s in node[1]:
                self.exec_stmt(s, env)
        elif tag == "decl":
            for name, init in node[1]:
                env[name] = self.eval(init, env) if init is not None else UNDEFINED
        elif tag == "return":
            raise _Return(self.eval(node[1], env) if node[1] is not None else UNDEFINED)
        elif tag == "if":
            if truthy(self.eval(node[1], env)):
                self.exec_stmt(node[2], env)
            elif node[3] is not None:
                self.exec_stmt(node[3], env)
        elif tag == "for":
            _, init, cond, upd, body = node
            if init is not None:
                self.exec_stmt(init, env)
            guard = 0
            while cond is None or truthy(self.eval(cond, env)):
                self.exec_stmt(body, env)
                if upd is not None:
                    self.eval(upd, env)
                guard += 1
                if guard > 1_000_000:
                    raise JSError("for-loop iteration bound exceeded")
        elif tag == "expr":
            self.eval(node[1], env)
        else:
            raise JSError(f"unknown statement {tag}")

    # ---- expressions

    def eval(self, node, env):
        tag = node[0]
        if tag == "num":
            return node[1]
        if tag == "str":
            return node[1]
        if tag == "bool":
            return node[1]
        if tag == "null":
            return None
        if tag == "undef":
            return UNDEFINED
        if tag == "var":
            if node[1] in env:
                return env[node[1]]
            raise JSError(f"undefined variable {node[1]!r}")
        if tag == "template":
            return "".join(
                p[1] if p[0] == "str" else js_str(self.eval(p, env)) for p in node[1]
            )
        if tag == "array":
            return [self.eval(e, env) for e in node[1]]
        if tag == "object":
            return {k: self.eval(v, env) for k, v in node[1]}
        if tag == "func":
            return JSFunction(node[1], node[2], env, self)
        if tag == "ternary":
            return (
                self.eval(node[2], env)
                if truthy(self.eval(node[1], env))
                else self.eval(node[3], env)
            )
        if tag == "binop":
            return self._binop(node[1], node[2], node[3], env)
        if tag == "unary":
            v = self.eval(node[2], env)
            if node[1] == "!":
                return not truthy(v)
            if node[1] == "-":
                return -to_number(v)
            return to_number(v)  # unary +
        if tag == "postfix":
            old = to_number(self.eval(node[2], env))
            self._store(node[2], old + (1.0 if node[1] == "++" else -1.0), env)
            return old
        if tag == "assign":
            cur = self.eval(node[3], env)
            if node[1] == "+=":
                base = self.eval(node[2], env)
                cur = self._plus(base, cur)
            elif node[1] == "-=":
                cur = to_number(self.eval(node[2], env)) - to_number(cur)
            self._store(node[2], cur, env)
            return cur
        if tag == "member":
            obj = self.eval(node[1], env)
            key = self.eval(node[2], env) if node[2][0] != "str" else node[2][1]
            return self._get(obj, key)
        if tag == "call":
            callee = node[1]
            if callee[0] == "member":
                obj = self.eval(callee[1], env)
                key = (
                    self.eval(callee[2], env)
                    if callee[2][0] != "str"
                    else callee[2][1]
                )
                fn = self._get(obj, key)
            else:
                fn = self.eval(callee, env)
            args = [self.eval(a, env) for a in node[2]]
            if not callable(fn):
                raise JSError(f"not callable: {fn!r}")
            return fn(*args)
        if tag == "new":
            if node[1] == "Date":
                args = [self.eval(a, env) for a in node[2]]
                return JSDate.parse(args[0]) if args else JSDate(NAN)
            raise JSError(f"unsupported constructor {node[1]}")
        raise JSError(f"unknown expression {tag}")

    def _store(self, target, value, env):
        if target[0] == "var":
            env[target[1]] = value
        elif target[0] == "member":
            obj = self.eval(target[1], env)
            key = (
                self.eval(target[2], env) if target[2][0] != "str" else target[2][1]
            )
            if isinstance(obj, dict):
                obj[key] = value
            elif isinstance(obj, list):
                obj[int(to_number(key))] = value
            else:
                raise JSError(f"cannot assign member on {obj!r}")
        else:
            raise JSError(f"bad assignment target {target[0]}")

    def _plus(self, a, b):
        if isinstance(a, str) or isinstance(b, str):
            return js_str(a) + js_str(b)
        return to_number(a) + to_number(b)

    def _binop(self, op, ln, rn, env):
        if op == "||":
            left = self.eval(ln, env)
            return left if truthy(left) else self.eval(rn, env)
        if op == "&&":
            left = self.eval(ln, env)
            return self.eval(rn, env) if truthy(left) else left
        a = self.eval(ln, env)
        b = self.eval(rn, env)
        if op == "+":
            return self._plus(a, b)
        if op == "-":
            return to_number(a) - to_number(b)
        if op == "*":
            return to_number(a) * to_number(b)
        if op == "/":
            x, y = to_number(a), to_number(b)
            if y == 0:
                return NAN if x == 0 or math.isnan(x) else math.copysign(math.inf, x * (1 if y >= 0 else -1))
            return x / y
        if op == "%":
            x, y = to_number(a), to_number(b)
            if y == 0 or math.isnan(x) or math.isnan(y) or math.isinf(x):
                return NAN
            return math.fmod(x, y)
        if op in ("===", "!=="):
            eq = self._strict_eq(a, b)
            return eq if op == "===" else not eq
        if op in ("==", "!="):
            # the pure layer only compares like types; loose == degrades
            # to strict for those (numeric coercion added when needed)
            eq = self._strict_eq(a, b) or (
                isinstance(a, (int, float, str, bool))
                and isinstance(b, (int, float, str, bool))
                and to_number(a) == to_number(b)
            )
            return eq if op == "==" else not eq
        x, y = to_number(a), to_number(b)
        if isinstance(a, str) and isinstance(b, str):
            if op == "<":
                return a < b
            if op == ">":
                return a > b
            if op == "<=":
                return a <= b
            return a >= b
        if math.isnan(x) or math.isnan(y):
            return False
        if op == "<":
            return x < y
        if op == ">":
            return x > y
        if op == "<=":
            return x <= y
        return x >= y

    @staticmethod
    def _strict_eq(a, b):
        if a is UNDEFINED or b is UNDEFINED:
            return a is b
        if a is None or b is None:
            return a is b
        if isinstance(a, bool) or isinstance(b, bool):
            return isinstance(a, bool) and isinstance(b, bool) and a == b
        if isinstance(a, (int, float)) and isinstance(b, (int, float)):
            return float(a) == float(b)
        if isinstance(a, str) and isinstance(b, str):
            return a == b
        return a is b

    # ---- property access

    def _get(self, obj, key):
        if obj is UNDEFINED or obj is None:
            raise JSError(f"cannot read property {key!r} of {js_str(obj)}")
        if isinstance(obj, dict):
            return obj.get(key, UNDEFINED)
        if isinstance(obj, list):
            if key == "length":
                return float(len(obj))
            if key == "filter":
                return lambda fn: [x for x in obj if truthy(fn(x))]
            if key == "join":
                return lambda sep=",": sep.join(
                    "" if x in (None, UNDEFINED) else js_str(x) for x in obj
                )
            if key == "push":
                def _push(*xs):
                    obj.extend(xs)
                    return float(len(obj))
                return _push
            if key == "map":
                return lambda fn: [fn(x) for x in obj]
            if isinstance(key, (int, float)):
                i = int(key)
                return obj[i] if 0 <= i < len(obj) else UNDEFINED
            return UNDEFINED
        if isinstance(obj, str):
            if key == "length":
                return float(len(obj))
            if key == "toUpperCase":
                return obj.upper
            if key == "toLowerCase":
                return obj.lower
            if key == "trim":
                return obj.strip
            return UNDEFINED
        if isinstance(obj, (int, float)) and not isinstance(obj, bool):
            if key == "toFixed":
                return lambda d=0: _to_fixed(obj, d)
            return UNDEFINED
        if isinstance(obj, JSDate):
            if key == "toLocaleDateString":
                return obj.toLocaleDateString
            if key == "getTime" or key == "valueOf":
                return lambda: obj.ms
            return UNDEFINED
        raise JSError(f"cannot read property {key!r} of {obj!r}")
