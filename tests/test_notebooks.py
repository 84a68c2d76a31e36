"""Execute the notebook front-ends end-to-end (twins of the reference's
src/{TRI,SBA,EKF,FTE,calib_with_gui}.ipynb) with nbclient on CPU — the
notebooks are living documentation and must stay runnable."""
import glob
import os

import nbformat
import pytest
from nbclient import NotebookClient

HERE = os.path.dirname(os.path.abspath(__file__))
NB_DIR = os.path.join(os.path.dirname(HERE), "notebooks")


@pytest.mark.parametrize(
    "name", ["TRI", "SBA", "EKF", "FTE", "calibration"]
)
def test_notebook_executes(name):
    path = os.path.join(NB_DIR, f"{name}.ipynb")
    nb = nbformat.read(path, as_version=4)
    client = NotebookClient(
        nb, timeout=600, kernel_name="python3",
        resources={"metadata": {"path": NB_DIR}},
    )
    client.execute()  # raises CellExecutionError on any failing cell
    # every code cell really ran
    codes = [c for c in nb.cells if c.cell_type == "code"]
    assert codes and all(c.execution_count for c in codes)


def test_all_reference_notebooks_have_twins():
    ref = {os.path.basename(p) for p in
           glob.glob("/root/reference/src/*.ipynb")}
    ours = {os.path.basename(p) for p in glob.glob(NB_DIR + "/*.ipynb")}
    mapping = {"TRI.ipynb": "TRI.ipynb", "SBA.ipynb": "SBA.ipynb",
               "EKF.ipynb": "EKF.ipynb", "FTE.ipynb": "FTE.ipynb",
               "calib_with_gui.ipynb": "calibration.ipynb"}
    for r in ref:
        assert mapping.get(r) in ours, f"no twin for reference {r}"
