"""Main application window (reference: optiland_gui/main_window.py, 1,022
LoC): dockable lens editor, viewer, system properties, analysis and
optimization panels, menu/toolbar actions, command palette, embedded
Python terminal, undo/redo, QSS themes.
"""

from __future__ import annotations

from optiland_tpu_gui import config
from optiland_tpu_gui.action_manager import ActionManager
from optiland_tpu_gui.analysis_panel import AnalysisPanel
from optiland_tpu_gui.lens_editor import LensEditor
from optiland_tpu_gui.optiland_connector import OptilandConnector
from optiland_tpu_gui.optimization_panel import OptimizationPanel
from optiland_tpu_gui.panel_manager import PanelManager
from optiland_tpu_gui.qt import (
    QApplication,
    QFileDialog,
    QMainWindow,
    QMessageBox,
    Qt,
)
from optiland_tpu_gui.system_properties_panel import SystemPropertiesPanel
from optiland_tpu_gui.utils import apply_plot_theme, install_logging
from optiland_tpu_gui.viewer_panel import ViewerPanel
from optiland_tpu_gui.widgets.command_palette import CommandPalette
from optiland_tpu_gui.widgets.frameless_window import FramelessWindow
from optiland_tpu_gui.widgets.python_terminal import PythonTerminal
from optiland_tpu_gui.widgets.sidebar import SidebarWidget
from optiland_tpu_gui.widgets.title_bar import TitleBar
from optiland_tpu_gui.widgets.toast import show_toast


class MainWindow(FramelessWindow):
    """Main window; native chrome by default, ``frameless=True`` switches
    to the custom TitleBar + edge-resize chrome (reference:
    main_window.py + widgets/frameless_window.py + custom_title_bar.py)."""

    def __init__(self, optic=None, parent=None, session_path=None,
                 frameless: bool = False):
        super().__init__(parent, frameless=frameless)
        self.setWindowTitle(config.APP_NAME)
        self.setObjectName("main_window")
        self.resize(*config.DEFAULT_WINDOW_SIZE)
        self.title_bar = None
        if frameless:
            self.title_bar = TitleBar(self, project_name=None)
            self.setMenuWidget(self.title_bar)

        from optiland_tpu.services.gui_support import SessionStore

        self.session = SessionStore(session_path)
        self.connector = OptilandConnector(optic, parent=self)
        self.actions_mgr = ActionManager(self)
        self.panels = PanelManager(self)
        self.palette = CommandPalette(self)

        self._build_panels()
        self._build_sidebar()
        self._build_actions()
        self._build_menus()
        self.set_theme(self.session.get("theme", config.DEFAULT_THEME))
        self._restore_layout()

        self.connector.opticLoaded.connect(
            lambda: self.statusBar().showMessage("System loaded", 3000)
        )
        if self.title_bar is not None:
            self.connector.opticLoaded.connect(
                lambda: self.title_bar.set_project_name(
                    getattr(self.connector.optic, "name", None)
                )
            )
        # lens editor "add as optimization variable" -> optimization panel
        self.connector.variableRequested.connect(self._on_variable_request)
        # surface library warnings as toasts (reference: logging_handler.py)
        install_logging(lambda msg: show_toast(self, msg))

    # ---------------- layout ----------------

    def _build_panels(self):
        c = self.connector
        self.lens_editor = LensEditor(c, self)
        self.viewer_panel = ViewerPanel(c, self)
        self.properties_panel = SystemPropertiesPanel(c, self)
        self.analysis_panel = AnalysisPanel(c, self)
        self.optimization_panel = OptimizationPanel(c, self)
        self.terminal = PythonTerminal(c, self)

        self.setCentralWidget(self.viewer_panel)
        left = Qt.DockWidgetArea.LeftDockWidgetArea
        bottom = Qt.DockWidgetArea.BottomDockWidgetArea
        right = Qt.DockWidgetArea.RightDockWidgetArea
        self.panels.add_panel("lens_editor", "Lens Editor",
                              self.lens_editor, left)
        self.panels.add_panel("properties", "System Properties",
                              self.properties_panel, left)
        self.panels.add_panel("analysis", "Analysis",
                              self.analysis_panel, right)
        self.panels.add_panel("optimization", "Optimization",
                              self.optimization_panel, right)
        self.panels.add_panel("terminal", "Console", self.terminal, bottom)
        self.panels.tabify("analysis", "optimization")

    def _build_sidebar(self):
        """Navigation rail docked on the far left (reference: sidebar.py)."""
        self.sidebar = SidebarWidget(self)
        _KEYMAP = {"lens_editor": "lens_editor", "viewer": None,
                   "analysis": "analysis", "optimization": "optimization",
                   "system": "properties", "terminal": "terminal"}

        def _go(key):
            dock_key = _KEYMAP.get(key)
            if dock_key is None:  # viewer is the central widget
                self.viewer_panel.setFocus()
            else:
                self.panels.raise_panel(dock_key)
            self.sidebar.set_active(key)

        self.sidebar.panel_requested.connect(_go)
        bar = self.addToolBar("Navigate")
        bar.setObjectName("sidebar_toolbar")
        bar.setMovable(False)
        bar.addWidget(self.sidebar)
        from optiland_tpu_gui.qt import Qt as _Qt

        self.addToolBar(_Qt.ToolBarArea.LeftToolBarArea, bar)

    # ---------------- actions / menus ----------------

    def _build_actions(self):
        a = self.actions_mgr
        c = self.connector
        a.add("new", "&New System", c.file.new_system, "Ctrl+N")
        a.add("open", "&Open...", self._open, "Ctrl+O")
        a.add("save", "&Save As...", self._save, "Ctrl+S")
        a.add("import_zmx", "Import &Zemax...", self._import_zmx)
        a.add("import_seq", "Import &CODE V...", self._import_seq)
        a.add("export_zmx", "Export Zema&x...", self._export_zmx)
        a.add("export_seq", "Export CO&DE V...", self._export_seq)
        a.add("quit", "&Quit", self.close, "Ctrl+Q")
        a.add("undo", "&Undo", c.undo, "Ctrl+Z")
        a.add("redo", "&Redo", c.redo, "Ctrl+Shift+Z")
        a.add("palette", "Command &Palette", self.palette.open,
              "Ctrl+Shift+P")
        a.add("theme_dark", "Dark Theme", lambda: self.set_theme("dark"))
        a.add("theme_light", "Light Theme", lambda: self.set_theme("light"))
        for key in ("lens_editor", "properties", "analysis",
                    "optimization", "terminal"):
            a.add(
                f"toggle_{key}", f"Toggle {key.replace('_', ' ').title()}",
                lambda k=key: self.panels.toggle(k),
            )
        for name, cb in a.palette_commands():
            self.palette.register(name, cb)

    def _build_menus(self):
        a = self.actions_mgr
        bar = self.menuBar()
        m_file = bar.addMenu("&File")
        for key in ("new", "open", "save"):
            m_file.addAction(a.get(key))
        m_file.addSeparator()
        self.recent_menu = m_file.addMenu("Open &Recent")
        self._rebuild_recent_menu()
        m_file.addSeparator()
        for key in ("import_zmx", "import_seq", "export_zmx", "export_seq"):
            m_file.addAction(a.get(key))
        m_file.addSeparator()
        m_file.addAction(a.get("quit"))

        m_edit = bar.addMenu("&Edit")
        m_edit.addAction(a.get("undo"))
        m_edit.addAction(a.get("redo"))

        m_view = bar.addMenu("&View")
        for key in ("lens_editor", "properties", "analysis",
                    "optimization", "terminal"):
            m_view.addAction(a.get(f"toggle_{key}"))
        m_view.addSeparator()
        m_view.addAction(a.get("theme_dark"))
        m_view.addAction(a.get("theme_light"))

        m_tools = bar.addMenu("&Tools")
        m_tools.addAction(a.get("palette"))

    def _on_variable_request(self, var_type, kwargs):
        self.optimization_panel.add_variable_row(var_type, dict(kwargs))
        self.panels.raise_panel("optimization")
        show_toast(self, f"Added {var_type} variable")

    # ---------------- file dialogs ----------------

    def _pick(self, save: bool, filt: str):
        fn = QFileDialog.getSaveFileName if save else QFileDialog.getOpenFileName
        path, _ = fn(self, "Select file", "", filt)
        return path

    def _guarded(self, fn, *args):
        try:
            fn(*args)
            show_toast(self, "Done")
        except Exception as err:
            QMessageBox.critical(self, "Error", f"{type(err).__name__}: {err}")

    def _open(self, path=None):
        path = path or self._pick(False, "Optiland JSON (*.json)")
        if path:
            self._guarded(self.connector.file.load, path)
            self._note_recent(path)

    def _save(self):
        path = self._pick(True, "Optiland JSON (*.json)")
        if path:
            self._guarded(self.connector.file.save, path)
            self._note_recent(path)

    def _import_zmx(self):
        path = self._pick(False, "Zemax (*.zmx)")
        if path:
            self._guarded(self.connector.file.import_zemax, path)
            self._note_recent(path)

    def _import_seq(self):
        path = self._pick(False, "CODE V (*.seq)")
        if path:
            self._guarded(self.connector.file.import_codev, path)
            self._note_recent(path)

    def _export_zmx(self):
        path = self._pick(True, "Zemax (*.zmx)")
        if path:
            self._guarded(self.connector.file.export_zemax, path)

    def _export_seq(self):
        path = self._pick(True, "CODE V (*.seq)")
        if path:
            self._guarded(self.connector.file.export_codev, path)

    # ---------------- recent files / session persistence ----------------

    def _note_recent(self, path: str):
        self.session.add_recent_file(path)
        self._rebuild_recent_menu()

    def _rebuild_recent_menu(self):
        from optiland_tpu_gui.qt import QAction

        self.recent_menu.clear()
        files = self.session.recent_files
        self.recent_menu.setEnabled(bool(files))
        for path in files:
            act = QAction(path, self)
            act.triggered.connect(lambda _=False, p=path: self._open_recent(p))
            self.recent_menu.addAction(act)

    def _open_recent(self, path: str):
        import os

        if path.endswith(".zmx"):
            self._guarded(self.connector.file.import_zemax, path)
        elif path.endswith(".seq"):
            self._guarded(self.connector.file.import_codev, path)
        elif os.path.exists(path):
            self._guarded(self.connector.file.load, path)
        else:
            self.session.remove_recent_file(path)
            self._rebuild_recent_menu()
            return
        self._note_recent(path)

    def _restore_layout(self):
        """Window geometry + dock layout from the previous session
        (reference: main_window.py QSettings restoreGeometry/State)."""
        geo = self.session.get_layout("geometry")
        state = self.session.get_layout("window_state")
        if geo:
            self.restoreGeometry(geo)
        if state:
            self.restoreState(state)

    def closeEvent(self, event):  # noqa: N802 (Qt naming)
        try:
            self.session.set_layout("geometry", bytes(self.saveGeometry()))
            self.session.set_layout("window_state", bytes(self.saveState()))
        except Exception:
            pass
        super().closeEvent(event)

    # ---------------- theming ----------------

    def set_theme(self, name: str):
        app = QApplication.instance()
        if app is not None:
            app.setStyleSheet(config.get_stylesheet(name))
        apply_plot_theme(name == "dark")
        self.session.set("theme", name)
        from optiland_tpu.visualization import set_theme as set_plot_theme

        try:
            set_plot_theme(config.PLOT_THEMES.get(name, "default"))
        except Exception:
            pass
