#!/usr/bin/env python3
"""Strict in-memory stand-ins for pyqtgraph + Qt, used to execute the Qt UI
backend (sspv_tpu/ui/qt.py) in this display-less, Qt-less image.

Deliberately NOT Mock-based: every class exposes only the methods the real
Qt/pyqtgraph API provides (of the subset qt.py uses), so a misspelled method
or signal name in qt.py raises AttributeError instead of silently passing.
State (label texts, curve data, enabled flags, message boxes shown) is
recorded for assertions.
"""

from __future__ import annotations

import sys
import types

import numpy as np


class Signal:
    def __init__(self):
        self._slots = []

    def connect(self, fn):
        self._slots.append(fn)

    def emit(self, *args):
        for fn in list(self._slots):
            fn(*args)


class _WidgetBase:
    def __init__(self, *args):
        self._enabled = True
        self._visible = False
        self._layout = None

    def setEnabled(self, on):
        self._enabled = bool(on)

    def isEnabled(self):
        return self._enabled

    def show(self):
        self._visible = True


class QWidget(_WidgetBase):
    def __init__(self, parent=None):
        super().__init__()
        self._title = ""
        self._size = None

    def setWindowTitle(self, title):
        self._title = title

    def resize(self, w, h):
        self._size = (w, h)


class QGroupBox(QWidget):
    def __init__(self, title=""):
        super().__init__()
        self._title = title


class _LayoutBase:
    def __init__(self, parent=None):
        self.items = []
        if parent is not None:
            parent._layout = self

    def addWidget(self, w, *grid_pos):
        self.items.append(w)

    def addLayout(self, l):
        self.items.append(l)

    def addStretch(self, stretch=0):
        pass


class QVBoxLayout(_LayoutBase):
    pass


class QHBoxLayout(_LayoutBase):
    pass


class QGridLayout(_LayoutBase):
    pass


class QAbstractButton(_WidgetBase):
    def __init__(self, text=""):
        super().__init__()
        self._text = text
        self._checked = False
        self.clicked = Signal()

    def setChecked(self, on):
        self._checked = bool(on)

    def isChecked(self):
        return self._checked

    def text(self):
        return self._text


class QRadioButton(QAbstractButton):
    pass


class QCheckBox(QAbstractButton):
    pass


class QPushButton(QAbstractButton):
    pass


class QButtonGroup:
    def __init__(self, parent=None):
        self._buttons = []

    def addButton(self, b):
        self._buttons.append(b)


class QLineEdit(_WidgetBase):
    def __init__(self):
        super().__init__()
        self._text = ""
        self._placeholder = ""

    def setPlaceholderText(self, t):
        self._placeholder = t

    def setText(self, t):
        self._text = t

    def text(self):
        return self._text


class QLabel(_WidgetBase):
    def __init__(self, text=""):
        super().__init__()
        self._text = text

    def setText(self, t):
        self._text = t

    def text(self):
        return self._text


class QComboBox(_WidgetBase):
    def __init__(self):
        super().__init__()
        self._items = []  # (text, data)
        self._index = 0

    def clear(self):
        self._items = []
        self._index = 0

    def addItem(self, text, data=None):
        self._items.append((text, data))

    def count(self):
        return len(self._items)

    def setCurrentIndex(self, i):
        self._index = i

    def currentData(self):
        if not self._items:
            return None
        return self._items[self._index][1]


class QFileDialog:
    # tests preload the "user's choice" here
    next_file = ""
    next_dir = ""

    @staticmethod
    def getOpenFileName(parent=None, caption=""):
        return QFileDialog.next_file, ""

    @staticmethod
    def getExistingDirectory(parent=None, caption=""):
        return QFileDialog.next_dir


class _ButtonRole:
    AcceptRole = 0
    RejectRole = 1


class QMessageBox(_WidgetBase):
    ButtonRole = _ButtonRole
    shown = []  # (kind, title, text) record of every box displayed
    # index of addButton()-ed button exec() "clicks" (None -> first)
    next_clicked_index = None

    def __init__(self, parent=None):
        super().__init__()
        self._title = ""
        self._text = ""
        self._buttons = []
        self._clicked = None

    def setWindowTitle(self, t):
        self._title = t

    def setText(self, t):
        self._text = t

    def addButton(self, text, role):
        b = QPushButton(text)
        self._buttons.append(b)
        return b

    def clickedButton(self):
        return self._clicked

    def exec(self):
        QMessageBox.shown.append(("question", self._title, self._text))
        i = QMessageBox.next_clicked_index or 0
        self._clicked = self._buttons[i] if self._buttons else None
        return 0

    @staticmethod
    def critical(parent, title, text):
        QMessageBox.shown.append(("critical", title, text))

    @staticmethod
    def information(parent, title, text):
        QMessageBox.shown.append(("information", title, text))


class QApplication(_WidgetBase):
    _instance = None

    def __init__(self, argv=None):
        super().__init__()
        self._stylesheet = ""
        self._quit_called = False
        QApplication._instance = self

    @staticmethod
    def instance():
        return QApplication._instance

    def setStyleSheet(self, s):
        self._stylesheet = s

    def quit(self):
        self._quit_called = True

    def exec(self):
        return 0


class QTimer:
    def __init__(self):
        self._interval = None
        self._started = False
        self.timeout = Signal()

    def setInterval(self, ms):
        self._interval = ms

    def start(self):
        self._started = True

    def stop(self):
        self._started = False


# -- pyqtgraph side ----------------------------------------------------------


class _Pen:
    def __init__(self, color, width):
        self.color, self.width = color, width


class _Brush:
    def __init__(self, color):
        self.color = color


class Curve:
    def __init__(self, step_mode=None):
        self.step_mode = step_mode
        self.x = None
        self.y = None
        self.n_sets = 0

    def setData(self, *args):
        self.n_sets += 1
        if len(args) == 1:
            self.x, self.y = None, np.asarray(args[0])
        elif len(args) == 2:
            self.x, self.y = np.asarray(args[0]), np.asarray(args[1])
            if self.step_mode == "center":
                assert len(self.x) == len(self.y) + 1, (
                    "stepMode='center' requires len(x) == len(y)+1",
                    len(self.x), len(self.y),
                )
        else:
            self.x, self.y = None, None


class PlotItem:
    def __init__(self, title=""):
        self.title = title
        self.curves = []
        self.y_range = None

    def showGrid(self, x=False, y=False, alpha=1.0):
        pass

    def plot(self, *args, pen=None, fillLevel=None, brush=None, stepMode=None):
        c = Curve(step_mode=stepMode)
        self.curves.append(c)
        return c

    def setYRange(self, lo, hi, padding=None):
        self.y_range = (float(lo), float(hi))


class GraphicsLayoutWidget(QWidget):
    def __init__(self):
        super().__init__()
        self.plots = {}

    def addPlot(self, row=0, col=0, title=""):
        p = PlotItem(title=title)
        self.plots[(row, col)] = p
        return p


def mkPen(color, width=1):
    return _Pen(color, width)


def mkBrush(color):
    return _Brush(color)


def install(monkeypatch):
    """Register stub ``pyqtgraph`` + ``pyqtgraph.Qt`` modules in sys.modules
    and reset class-level recording state. Returns (pg_mod, qt_mod)."""
    QMessageBox.shown = []
    QMessageBox.next_clicked_index = None
    QApplication._instance = None
    QFileDialog.next_file = ""
    QFileDialog.next_dir = ""

    qtwidgets = types.ModuleType("QtWidgets")
    for cls in (
        QApplication, QWidget, QGroupBox, QVBoxLayout, QHBoxLayout,
        QGridLayout, QRadioButton, QCheckBox, QPushButton, QButtonGroup,
        QLineEdit, QLabel, QComboBox, QFileDialog, QMessageBox,
    ):
        setattr(qtwidgets, cls.__name__, cls)
    qtcore = types.ModuleType("QtCore")
    qtcore.QTimer = QTimer

    qt_mod = types.ModuleType("pyqtgraph.Qt")
    qt_mod.QtWidgets = qtwidgets
    qt_mod.QtCore = qtcore

    pg_mod = types.ModuleType("pyqtgraph")
    pg_mod.GraphicsLayoutWidget = GraphicsLayoutWidget
    pg_mod.mkPen = mkPen
    pg_mod.mkBrush = mkBrush
    pg_mod.Qt = qt_mod

    monkeypatch.setitem(sys.modules, "pyqtgraph", pg_mod)
    monkeypatch.setitem(sys.modules, "pyqtgraph.Qt", qt_mod)
    return pg_mod, qt_mod
