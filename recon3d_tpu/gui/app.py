"""Desktop GUI application shell.

Capability parity with reference src/gui/main_app.py (MainWindow :16-412):
the eight method presets (:79-86), options -> CLI flag mapping (:202-246),
subprocess execution with live log + status, result-file discovery
(:285-293), and a viewer tab. Qt is optional (the reference hard-requires
PyQt5; here the same presets/mapping/discovery are importable headless and
only MainWindow needs Qt).
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Dict, List, Optional, Tuple

from recon3d_tpu.runtime.worker import ReconstructionWorker, build_command

# (label, options) presets — reference main_app.py:79-86
METHOD_PRESETS: List[Tuple[str, Dict]] = [
    ("COLMAP Dense (best quality)", {"method": "colmap_dense"}),
    ("COLMAP Sparse (fast)", {"method": "colmap_sparse"}),
    ("Custom: Neural + PatchMatch MVS", {"neural": True, "mvs": True}),
    ("Custom: Neural + Plane-sweep", {"neural": True, "stereo": True}),
    ("Custom: Neural sparse", {"neural": True}),
    ("Custom: SIFT + PatchMatch MVS", {"mvs": True}),
    ("Custom: SIFT + Plane-sweep", {"stereo": True}),
    ("Custom: SIFT sparse", {}),
]

# output files to look for after a run — reference main_app.py:285-293
RESULT_CANDIDATES = [
    "dense_mvs.ply",
    "dense_stereo.ply",
    "dense.ply",
    "sparse.ply",
]


def find_result_file(output_dir: str) -> Optional[str]:
    """First existing result PLY in preference order (reference :285-293)."""
    for name in RESULT_CANDIDATES:
        p = os.path.join(output_dir, name)
        if os.path.exists(p):
            return p
    return None


try:
    from PyQt5 import QtWidgets, QtCore  # type: ignore

    HAS_QT = True
except Exception:  # pragma: no cover
    HAS_QT = False

if HAS_QT:  # pragma: no cover - needs a display

    class MainWindow(QtWidgets.QMainWindow):
        """Reconstruction launcher + viewer (reference MainWindow)."""

        log_line = QtCore.pyqtSignal(str)
        status_line = QtCore.pyqtSignal(str)
        run_done = QtCore.pyqtSignal(bool)

        def __init__(self):
            super().__init__()
            from recon3d_tpu.gui.viewer import ViewerTab

            self.setWindowTitle("recon3d_tpu")
            tabs = QtWidgets.QTabWidget()
            self.setCentralWidget(tabs)

            run_tab = QtWidgets.QWidget()
            form = QtWidgets.QVBoxLayout(run_tab)
            self.dir_edit = QtWidgets.QLineEdit()
            browse = QtWidgets.QPushButton("Browse...")
            browse.clicked.connect(self._browse)
            row = QtWidgets.QHBoxLayout()
            row.addWidget(self.dir_edit)
            row.addWidget(browse)
            form.addLayout(row)
            self.method_box = QtWidgets.QComboBox()
            for label, _ in METHOD_PRESETS:
                self.method_box.addItem(label)
            form.addWidget(self.method_box)
            self.start_btn = QtWidgets.QPushButton("Start reconstruction")
            self.start_btn.clicked.connect(self.start_reconstruction)
            form.addWidget(self.start_btn)
            self.status = QtWidgets.QLabel("idle")
            form.addWidget(self.status)
            self.log = QtWidgets.QPlainTextEdit()
            self.log.setReadOnly(True)
            form.addWidget(self.log)
            tabs.addTab(run_tab, "Reconstruct")

            self.viewer = ViewerTab()
            tabs.addTab(self.viewer, "Viewer")

            self.log_line.connect(self.log.appendPlainText)
            self.status_line.connect(self.status.setText)
            self.run_done.connect(self._finished)
            self.worker: Optional[ReconstructionWorker] = None

        def _browse(self):
            d = QtWidgets.QFileDialog.getExistingDirectory(self, "Image dir")
            if d:
                self.dir_edit.setText(d)

        def start_reconstruction(self):
            dataset = self.dir_edit.text().strip()
            if not dataset:
                return
            _, options = METHOD_PRESETS[self.method_box.currentIndex()]
            options = dict(options)
            options["output"] = str(Path(dataset) / "reconstruction")
            self._out_dir = options["output"]
            self.worker = ReconstructionWorker(
                on_log=self.log_line.emit,
                on_status=self.status_line.emit,
                on_finished=self.run_done.emit,
            )
            self.start_btn.setEnabled(False)
            self.worker.start_async(dataset, options)

        def _finished(self, ok: bool):
            self.start_btn.setEnabled(True)
            self.status.setText("done" if ok else "FAILED")
            result = find_result_file(self._out_dir)
            if ok and result:
                self.viewer.load_ply_file(result)


def main():  # pragma: no cover
    if not HAS_QT:
        raise SystemExit(
            "PyQt5 is not installed. Use the CLI (python -m recon3d_tpu.cli) "
            "or the headless viewer (recon3d_tpu.gui.viewer.render_turntable)."
        )
    import sys

    app = QtWidgets.QApplication(sys.argv)
    win = MainWindow()
    win.show()
    sys.exit(app.exec_())


if __name__ == "__main__":  # pragma: no cover
    main()
