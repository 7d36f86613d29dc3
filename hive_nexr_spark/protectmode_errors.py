"""Protect-mode failure (`ql/metadata/Table.java` ProtectMode checks;
error texts pinned by protectmode_tbl*/part*.q.out goldens)."""


class ProtectModeError(Exception):
    pass
