"""A working miniature cvxpy, sufficient to run the reference MPC in-process.

The reference's MPC (``/root/reference/src/pymgrid/algos/mpc/mpc.py``) uses a
small, closed subset of cvxpy:

* ``cp.Variable((n,), pos=True)`` and ``cp.Variable((H,), boolean=True)``
* ``cp.Parameter(n[, nonneg=True])`` with ``.value`` assignment
* expressions: ``matrix @ var`` (ndarray/csr or 1-D Parameter), ``scalar *
  var``, ``var[::k]`` slicing
* constraints: ``expr == param`` and ``expr <= expr/param``
* ``cp.Minimize(param @ var)``, ``cp.Problem(objective, constraints)``,
  ``problem.solve(warm_start=..., solver=...)``, ``problem.status``,
  ``problem.is_mixed_integer()``, ``cp.installed_solvers()``

This module implements exactly that subset on top of scipy's HiGHS
(``milp``), so parity tests can execute the REFERENCE's own MPC formulation
and compare its trajectories directly — no recorded fixtures, no cvxpy
install.
"""
import numpy as np

MOSEK = "MOSEK"
GLPK_MI = "GLPK_MI"
ECOS = "ECOS"

__version__ = "0.0-shim"


def installed_solvers():
    return [GLPK_MI]


def _as_size(shape):
    if isinstance(shape, tuple):
        size = 1
        for s in shape:
            size *= s
        return size
    return int(shape)


class _Node:
    """Affine expression node.  High array priority + disabled ufuncs make
    numpy/scipy defer binary ops to these classes."""

    __array_priority__ = 10000
    __array_ufunc__ = None

    def __le__(self, other):
        return Inequality(self, other)

    def __ge__(self, other):
        return Inequality(other, self)

    def __eq__(self, other):
        return Equality(self, other)

    __hash__ = object.__hash__

    def __rmatmul__(self, matrix):
        return MatMul(matrix, self)

    def __rmul__(self, scalar):
        return ScalarMul(scalar, self)

    def __mul__(self, scalar):
        return ScalarMul(scalar, self)

    def __getitem__(self, key):
        return Sliced(self, key)


class Variable(_Node):
    def __init__(self, shape, pos=False, boolean=False, nonneg=False, **kwargs):
        self.shape = shape if isinstance(shape, tuple) else (int(shape),)
        self.size = _as_size(shape)
        self.pos = pos
        self.boolean = boolean
        self.nonneg = nonneg
        self.value = None


class Parameter:
    """A named constant whose value is read at solve time."""

    __array_priority__ = 10000
    __array_ufunc__ = None

    def __init__(self, shape=(), nonneg=False, **kwargs):
        self.shape = shape if isinstance(shape, tuple) else (int(shape),)
        self.size = _as_size(shape)
        self.nonneg = nonneg
        self.value = None

    def __matmul__(self, other):
        if isinstance(other, _Node):
            return MatMul(self, other)
        return NotImplemented


class MatMul(_Node):
    def __init__(self, matrix, operand):
        self.matrix = matrix
        self.operand = operand


class ScalarMul(_Node):
    def __init__(self, scalar, operand):
        self.scalar = scalar
        self.operand = operand


class Sliced(_Node):
    def __init__(self, operand, key):
        self.operand = operand
        self.key = key


class Inequality:
    def __init__(self, lhs, rhs):
        self.lhs, self.rhs = lhs, rhs


class Equality:
    def __init__(self, lhs, rhs):
        self.lhs, self.rhs = lhs, rhs


class Minimize:
    def __init__(self, expr):
        self.expr = expr


def _resolve(value):
    """Parameter/array/scalar -> concrete ndarray (at solve time)."""
    if isinstance(value, Parameter):
        if value.value is None:
            raise ValueError("Parameter used before assignment")
        return np.asarray(value.value, dtype=float)
    if hasattr(value, "todense"):  # scipy sparse
        return np.asarray(value.todense(), dtype=float)
    return np.asarray(value, dtype=float)


def _affine(expr):
    """Expression -> ({Variable: coef (m, var.size)}, const (m,))."""
    if isinstance(expr, Variable):
        return {expr: np.eye(expr.size)}, np.zeros(expr.size)
    if isinstance(expr, (Parameter, np.ndarray, float, int)) or hasattr(
        expr, "todense"
    ):
        const = np.atleast_1d(_resolve(expr)).reshape(-1)
        return {}, const
    if isinstance(expr, MatMul):
        M = _resolve(expr.matrix)
        if M.ndim == 1:
            M = M.reshape(1, -1)
        coefs, const = _affine(expr.operand)
        return {v: M @ c for v, c in coefs.items()}, M @ const
    if isinstance(expr, ScalarMul):
        s = float(_resolve(expr.scalar))
        coefs, const = _affine(expr.operand)
        return {v: s * c for v, c in coefs.items()}, s * const
    if isinstance(expr, Sliced):
        coefs, const = _affine(expr.operand)
        return {v: c[expr.key] for v, c in coefs.items()}, const[expr.key]
    raise TypeError(f"Unsupported expression {type(expr)}")


def _difference(lhs, rhs):
    """(lhs - rhs) as ({var: coef}, const), broadcasting scalar consts."""
    l_coefs, l_const = _affine(lhs)
    r_coefs, r_const = _affine(rhs)

    rows = 1
    for c in list(l_coefs.values()) + list(r_coefs.values()):
        rows = max(rows, c.shape[0])
    rows = max(rows, l_const.shape[0], r_const.shape[0])

    def expand_const(v):
        return np.broadcast_to(v, (rows,)).astype(float)

    coefs = {}
    for v, c in l_coefs.items():
        coefs[v] = coefs.get(v, 0) + c
    for v, c in r_coefs.items():
        coefs[v] = coefs.get(v, 0) - c
    return coefs, expand_const(l_const) - expand_const(r_const)


class Problem:
    def __init__(self, objective, constraints=()):
        if not isinstance(objective, Minimize):
            raise TypeError("Only Minimize objectives are supported")
        self.objective = objective
        self.constraints = list(constraints)
        self.status = None
        self._variables = self._collect_variables()

    def _collect_variables(self):
        seen = []

        def walk(expr):
            if isinstance(expr, Variable):
                # identity check: __eq__ is overloaded to build constraints
                if not any(expr is known for known in seen):
                    seen.append(expr)
            elif isinstance(expr, (MatMul, ScalarMul)):
                walk(expr.operand)
            elif isinstance(expr, Sliced):
                walk(expr.operand)

        walk(self.objective.expr)
        for con in self.constraints:
            walk(con.lhs)
            walk(con.rhs)
        return seen

    def is_mixed_integer(self):
        return any(v.boolean for v in self._variables)

    def solve(self, warm_start=False, solver=None, **kwargs):
        from scipy import sparse
        from scipy.optimize import Bounds, LinearConstraint, milp

        variables = self._variables
        offsets, n = {}, 0
        for v in variables:
            offsets[v] = n
            n += v.size

        def stretch(coefs, const):
            rows = const.shape[0]
            full = np.zeros((rows, n))
            for v, c in coefs.items():
                full[:, offsets[v] : offsets[v] + v.size] = c
            return full, const

        obj_coefs, obj_const = _affine(self.objective.expr)
        c_full = np.zeros(n)
        for v, coef in obj_coefs.items():
            c_full[offsets[v] : offsets[v] + v.size] = coef.reshape(-1)

        lin_constraints = []
        for con in self.constraints:
            coefs, const = _difference(con.lhs, con.rhs)
            full, const = stretch(coefs, const)
            if isinstance(con, Equality):
                lin_constraints.append(
                    LinearConstraint(sparse.csr_matrix(full), -const, -const)
                )
            else:
                lin_constraints.append(
                    LinearConstraint(sparse.csr_matrix(full), -np.inf, -const)
                )

        lb = np.full(n, -np.inf)
        ub = np.full(n, np.inf)
        integrality = np.zeros(n)
        for v in variables:
            sl = slice(offsets[v], offsets[v] + v.size)
            if v.pos or v.nonneg or v.boolean:
                lb[sl] = 0.0
            if v.boolean:
                ub[sl] = 1.0
                integrality[sl] = 1

        res = milp(
            c=c_full,
            constraints=lin_constraints,
            integrality=integrality,
            bounds=Bounds(lb=lb, ub=ub),
        )

        if not res.success:
            self.status = "infeasible"
            return None

        self.status = "optimal"
        for v in variables:
            v.value = res.x[offsets[v] : offsets[v] + v.size].reshape(v.shape)
        return float(c_full @ res.x + obj_const.sum())


class _ErrorModule:
    SolverError = RuntimeError


error = _ErrorModule()
