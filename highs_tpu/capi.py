"""Flat C-style API.

Re-implements the reference C API surface (highs/interfaces/
highs_c_api.h: 174 flat `Highs_*` functions over an opaque handle) as
module-level functions over a Highs instance, so code written against
the reference's C/ctypes conventions ports mechanically:

    h = Highs_create()
    Highs_passLp(h, ...);  Highs_run(h)
    status, obj = Highs_getObjectiveValue(h), ...
    Highs_destroy(h)

Return conventions follow the reference: functions return a HighsInt
status (0 ok, -1 error, 1 warning); outputs are returned as values
(Python has no out-params).
"""
from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import numpy as np

from .constants import (HighsModelStatus, HighsStatus, HighsVarType,
                        MatrixFormat, ObjSense, kHighsInf)
from .modeling import Highs
from .models.lp import HighsHessian, HighsLp, HighsModel, \
    HighsSparseMatrix

kHighsStatusError = -1
kHighsStatusOk = 0
kHighsStatusWarning = 1

kHighsMatrixFormatColwise = 1
kHighsMatrixFormatRowwise = 2

kHighsObjSenseMinimize = 1
kHighsObjSenseMaximize = -1

kHighsVarTypeContinuous = 0
kHighsVarTypeInteger = 1
kHighsVarTypeSemiContinuous = 2
kHighsVarTypeSemiInteger = 3

kHighsInfinity = kHighsInf


def Highs_create() -> Highs:
    return Highs()


def Highs_destroy(h: Highs) -> None:
    h.clear()


def Highs_version() -> str:
    return Highs().version()


def Highs_readModel(h: Highs, filename: str) -> int:
    return int(h.readModel(filename))


def Highs_writeModel(h: Highs, filename: str) -> int:
    return int(h.writeModel(filename))


def Highs_run(h: Highs) -> int:
    return int(h.run())


def Highs_clear(h: Highs) -> int:
    return int(h.clear())


def Highs_clearModel(h: Highs) -> int:
    return int(h.clearModel())


def Highs_clearSolver(h: Highs) -> int:
    return int(h.clearSolver())


def Highs_passLp(h: Highs, num_col: int, num_row: int, num_nz: int,
                 a_format: int, sense: int, offset: float,
                 col_cost, col_lower, col_upper, row_lower, row_upper,
                 a_start, a_index, a_value) -> int:
    import scipy.sparse as sp
    try:
        if a_format == kHighsMatrixFormatColwise:
            a = sp.csc_matrix(
                (np.asarray(a_value[:num_nz], dtype=np.float64),
                 np.asarray(a_index[:num_nz], dtype=np.int64),
                 np.asarray(list(a_start[:num_col]) + [num_nz],
                            dtype=np.int64)),
                shape=(num_row, num_col))
        else:
            a = sp.csr_matrix(
                (np.asarray(a_value[:num_nz], dtype=np.float64),
                 np.asarray(a_index[:num_nz], dtype=np.int64),
                 np.asarray(list(a_start[:num_row]) + [num_nz],
                            dtype=np.int64)),
                shape=(num_row, num_col)).tocsc()
        lp = HighsLp(
            num_col=num_col, num_row=num_row,
            col_cost=np.asarray(col_cost, dtype=np.float64),
            col_lower=np.asarray(col_lower, dtype=np.float64),
            col_upper=np.asarray(col_upper, dtype=np.float64),
            row_lower=np.asarray(row_lower, dtype=np.float64),
            row_upper=np.asarray(row_upper, dtype=np.float64),
            a_matrix=HighsSparseMatrix.from_scipy(a),
            sense=ObjSense(sense), offset=offset)
        return int(h.passModel(lp))
    except Exception:
        return kHighsStatusError


def Highs_passMip(h: Highs, num_col, num_row, num_nz, a_format, sense,
                  offset, col_cost, col_lower, col_upper, row_lower,
                  row_upper, a_start, a_index, a_value,
                  integrality) -> int:
    status = Highs_passLp(h, num_col, num_row, num_nz, a_format, sense,
                          offset, col_cost, col_lower, col_upper,
                          row_lower, row_upper, a_start, a_index,
                          a_value)
    if status != kHighsStatusOk:
        return status
    h.getLp().integrality = np.asarray(integrality, dtype=np.uint8)
    return kHighsStatusOk


def Highs_passHessian(h: Highs, dim: int, num_nz: int, q_format: int,
                      q_start, q_index, q_value) -> int:
    hessian = HighsHessian(
        dim=dim,
        start=np.asarray(list(q_start[:dim]) + [num_nz], dtype=np.int64),
        index=np.asarray(q_index[:num_nz], dtype=np.int64),
        value=np.asarray(q_value[:num_nz], dtype=np.float64))
    return int(h.passHessian(hessian))


# ---- solve results ---------------------------------------------------------

def Highs_getModelStatus(h: Highs) -> int:
    return int(h.getModelStatus())


def Highs_getObjectiveValue(h: Highs) -> float:
    return h.getObjectiveValue()


def Highs_getSolution(h: Highs):
    """Returns (status, col_value, col_dual, row_value, row_dual)."""
    sol = h.getSolution()
    return (kHighsStatusOk, np.asarray(sol.col_value),
            np.asarray(sol.col_dual), np.asarray(sol.row_value),
            np.asarray(sol.row_dual))


def Highs_getBasis(h: Highs):
    """Returns (status, col_status, row_status)."""
    basis = h.getBasis()
    if not basis.valid:
        return kHighsStatusError, None, None
    return (kHighsStatusOk,
            np.asarray([int(s) for s in basis.col_status]),
            np.asarray([int(s) for s in basis.row_status]))


def Highs_getNumCol(h: Highs) -> int:
    return h.getNumCol()


def Highs_getNumRow(h: Highs) -> int:
    return h.getNumRow()


def Highs_getNumNz(h: Highs) -> int:
    return h.getNumNz()


def Highs_getRunTime(h: Highs) -> float:
    return h.getRunTime()


# ---- options / info ---------------------------------------------------------

def Highs_setBoolOptionValue(h, name, value) -> int:
    return int(h.setOptionValue(name, bool(value)))


def Highs_setIntOptionValue(h, name, value) -> int:
    return int(h.setOptionValue(name, int(value)))


def Highs_setDoubleOptionValue(h, name, value) -> int:
    return int(h.setOptionValue(name, float(value)))


def Highs_setStringOptionValue(h, name, value) -> int:
    return int(h.setOptionValue(name, str(value)))


def _get_option(h, name):
    value = h.getOptionValue(name)
    return (kHighsStatusOk, value) if value is not None else \
        (kHighsStatusError, None)


Highs_getBoolOptionValue = _get_option
Highs_getIntOptionValue = _get_option
Highs_getDoubleOptionValue = _get_option
Highs_getStringOptionValue = _get_option


def Highs_resetOptions(h) -> int:
    return int(h.resetOptions())


def Highs_readOptions(h, filename) -> int:
    return int(h.readOptions(filename))


def Highs_writeOptions(h, filename) -> int:
    return int(h.writeOptions(filename))


def Highs_getIntInfoValue(h, name):
    try:
        return kHighsStatusOk, int(h.getInfoValue(name))
    except (KeyError, TypeError, ValueError):
        return kHighsStatusError, None


def Highs_getDoubleInfoValue(h, name):
    try:
        return kHighsStatusOk, float(h.getInfoValue(name))
    except (KeyError, TypeError, ValueError):
        return kHighsStatusError, None


def Highs_getInt64InfoValue(h, name):
    return Highs_getIntInfoValue(h, name)


# ---- model modification ------------------------------------------------------

def Highs_addCol(h, cost, lower, upper, num_new_nz, index, value) -> int:
    return int(h.addCol(cost, lower, upper, num_new_nz, index, value))


def Highs_addCols(h, num_new_col, costs, lower, upper, num_new_nz,
                  starts, index, value) -> int:
    return int(h.addCols(num_new_col, costs, lower, upper, num_new_nz,
                         starts, index, value))


def Highs_addRow(h, lower, upper, num_new_nz, index, value) -> int:
    return int(h.addRow(lower, upper, num_new_nz, index, value))


def Highs_addRows(h, num_new_row, lower, upper, num_new_nz, starts,
                  index, value) -> int:
    return int(h.addRows(num_new_row, lower, upper, num_new_nz, starts,
                         index, value))


def Highs_addVar(h, lower, upper) -> int:
    return int(h.addVar(lower, upper))


def Highs_changeColCost(h, col, cost) -> int:
    return int(h.changeColCost(col, cost))


def Highs_changeColBounds(h, col, lower, upper) -> int:
    return int(h.changeColBounds(col, lower, upper))


def Highs_changeRowBounds(h, row, lower, upper) -> int:
    return int(h.changeRowBounds(row, lower, upper))


def Highs_changeCoeff(h, row, col, value) -> int:
    return int(h.changeCoeff(row, col, value))


def Highs_changeColIntegrality(h, col, integrality) -> int:
    return int(h.changeColIntegrality(col, HighsVarType(integrality)))


def Highs_changeObjectiveSense(h, sense) -> int:
    return int(h.changeObjectiveSense(ObjSense(sense)))


def Highs_changeObjectiveOffset(h, offset) -> int:
    return int(h.changeObjectiveOffset(offset))


def Highs_deleteColsByRange(h, from_col, to_col) -> int:
    return int(h.deleteCols(from_col, to_col))


def Highs_deleteRowsByRange(h, from_row, to_row) -> int:
    return int(h.deleteRows(from_row, to_row))


def Highs_deleteColsBySet(h, num, idx_set) -> int:
    return int(h.deleteCols(num, idx_set))


def Highs_deleteRowsBySet(h, num, idx_set) -> int:
    return int(h.deleteRows(num, idx_set))


def Highs_passColName(h, col, name) -> int:
    return int(h.passColName(col, name))


def Highs_passRowName(h, row, name) -> int:
    return int(h.passRowName(row, name))


# ---- solution IO / extras ----------------------------------------------------

def Highs_writeSolution(h, filename) -> int:
    return int(h.writeSolution(filename, 0))


def Highs_writeSolutionPretty(h, filename) -> int:
    return int(h.writeSolution(filename, 1))


def Highs_crossover(h, num_col, num_row, col_value, col_dual,
                    row_dual) -> int:
    from .models.solution import HighsSolution
    sol = HighsSolution(
        value_valid=True, dual_valid=col_dual is not None,
        col_value=np.asarray(col_value, dtype=np.float64),
        col_dual=(np.asarray(col_dual, dtype=np.float64)
                  if col_dual is not None else np.zeros(num_col)),
        row_value=np.zeros(num_row),
        row_dual=(np.asarray(row_dual, dtype=np.float64)
                  if row_dual is not None else np.zeros(num_row)))
    return int(h.crossover(sol))


def Highs_getDualRay(h):
    has_ray, ray = h.getDualRay()
    return (kHighsStatusOk if has_ray else kHighsStatusError), ray


def Highs_getPrimalRay(h):
    has_ray, ray = h.getPrimalRay()
    return (kHighsStatusOk if has_ray else kHighsStatusError), ray


def Highs_setCallback(h, callback, user_data) -> int:
    return int(h.setCallback(callback, user_data))


def Highs_startCallback(h, callback_type) -> int:
    return int(h.startCallback(callback_type))


def Highs_stopCallback(h, callback_type) -> int:
    return int(h.stopCallback(callback_type))
