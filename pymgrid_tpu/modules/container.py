"""Module container: two-axis taxonomy storage and views.

Mirrors ``src/pymgrid/modules/module_container.py``: modules are stored in
nine ``(fixed|flex|controllable) x (sources|sinks|source_and_sinks)``
subcontainers, with midlevel views (``container.fixed.sources`` etc.), dict
and attribute access by module name, auto-naming from ``module_type[0]``, and
``get_attrs`` aggregation.

Iteration order is load-bearing for simulation semantics: ``to_dict`` /
``iterdict`` walk subcontainers fixed -> flex -> controllable, each
sources -> sinks -> source_and_sinks, with insertion order within each
subcontainer.  The compiled engine derives its static summation order from
this same walk.
"""
import json
from collections import UserDict, UserList

from pymgrid_tpu.modules.base import BaseMicrogridModule

__all__ = ["Container", "ModuleContainer", "ModuleList", "get_subcontainers"]

_SOURCE_SINK_KEYS = ("sources", "sinks", "source_and_sinks")
_FFC_KEYS = ("fixed", "flex", "controllable")


class ModuleList(UserList):
    def item(self):
        if len(self) != 1:
            raise ValueError("Can only convert a ModuleList of length one to a scalar")
        return self[0]

    def to_list(self):
        return self


class Container(UserDict):
    """Dict of named module lists (or of nested containers) with attribute
    access and flattening helpers."""

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.dir_additions = self._compute_dir_additions()

    def _compute_dir_additions(self):
        additions = set(self.keys())
        for x in self.values():
            try:
                additions.update(x.dir_additions)
            except AttributeError:
                pass
        return additions

    @property
    def containers(self):
        return self

    def to_list(self):
        l = []
        for _, raw in self.containers.items():
            l.extend(raw.to_list())
        return l

    def to_dict(self):
        d = dict()
        for k, raw in self.containers.items():
            if isinstance(raw, ModuleList):
                # bottom-level container: name -> module list (the reference
                # crashes here, module_container.py:52; fixed deviation)
                d[k] = raw
            else:
                d.update(raw)
        return d

    def to_tuples(self):
        l = []
        for name, modules in self.iterdict():
            l.extend(zip([name] * len(modules), modules))
        return l

    def iterlist(self):
        yield from self.to_list()

    def iterdict(self):
        yield from self.to_dict().items()

    def names(self):
        return list(self.to_dict().keys())

    def get_attrs(self, *attrs, unique=False, as_pandas=True):
        """Gather module attributes; missing attributes become
        ``NotImplemented`` (see reference ``module_container.py:97-195``)."""
        import pandas as pd

        if not attrs:
            raise ValueError("Missing attrs to get.")

        d = dict()
        for _, raw in self.containers.items():
            d.update(
                {
                    name: [
                        {attr: getattr(module, attr, NotImplemented) for attr in attrs}
                        for module in module_list
                    ]
                    for name, module_list in raw.items()
                }
            )

        if not (unique or as_pandas):
            return d

        d_df = pd.DataFrame(
            {
                (name, num): subdict
                for name, module_list in d.items()
                for num, subdict in enumerate(module_list)
            }
        ).T

        bad_keys, uniques, nonuniques = [], {}, []
        for k, v in d_df.items():
            not_notimplemented = v[v != NotImplemented]
            unique_items = not_notimplemented.drop_duplicates().values
            try:
                unique_item = unique_items.item()
            except ValueError:
                if len(unique_items) == 0:
                    bad_keys.append(k)
                else:
                    nonuniques.append(k)
            else:
                uniques[k] = unique_item

        if bad_keys:
            raise AttributeError(f"No values found for key(s) {bad_keys}")

        if unique:
            if nonuniques:
                raise ValueError(
                    f"Attribute(s) {nonuniques} have non-unique values, cannot "
                    f"return single unique value."
                )
            if not as_pandas:
                return uniques
            return pd.Series(uniques, dtype=None if len(uniques) else float)

        if as_pandas:
            return d_df
        return d

    def __getitem__(self, item):
        if item in ("data", "module_dict"):
            raise KeyError(item)
        try:
            return self.data[item]
        except KeyError:
            try:
                return self.to_dict()[item]
            except KeyError:
                raise KeyError(item)

    def __getattr__(self, item):
        if item == "data" or item.startswith("__") or item not in dir(self):
            raise AttributeError(item)
        try:
            return self[item]
        except KeyError:
            raise AttributeError(item)

    def __contains__(self, item):
        return item in self.data.keys() or item in self.dir_additions

    def __len__(self):
        return sum(len(v) for _, v in self.containers.items())

    def __dir__(self):
        return sorted(set(super().__dir__()) | self.dir_additions)

    def __repr__(self):
        try:
            return json.dumps(self.to_dict(), indent=2, default=str)
        except TypeError:
            return super().__repr__()


def _build_subcontainers(modules):
    """Assign modules to the nine taxonomy cells and name them.

    Auto-names come from ``module_type[0]``; each module gets
    ``module.name = (name, index)`` with per-name indices; a name used by two
    different taxonomy cells raises (reference ``module_container.py:355-413``).
    """
    by_ffc = {ffc: {k: dict() for k in _SOURCE_SINK_KEYS} for ffc in _FFC_KEYS}
    module_names = dict()

    for module in modules:
        try:  # (name, module) tuple
            module_name, module = module
            ffc = module.__class__.module_type[1]
        except TypeError:
            try:
                module_name, ffc = module.__class__.module_type
            except TypeError:
                raise NotImplementedError(
                    f"Must define the class attribute module_type for class "
                    f"{module.__class__.__name__}"
                )

        assert isinstance(module, BaseMicrogridModule), (
            "Module must inherit from BaseMicrogridModule."
        )
        assert module.is_sink or module.is_source, "Module must be sink or source (or both)."

        source_sink = (
            "source_and_sinks"
            if module.is_sink and module.is_source
            else "sources" if module.is_source else "sinks"
        )

        if ffc not in by_ffc:
            raise TypeError(
                f"Cannot parse fixed_flex_controllable from module type "
                f"{module.__class__.module_type}"
            )

        existing = module_names.get(module_name)
        if existing is not None and existing != (ffc, source_sink):
            raise NameError(
                f"Attempted to add module {module_name} of type {(ffc, source_sink)}, "
                f"but there is an identically named module of type {existing}."
            )
        module_names[module_name] = (ffc, source_sink)

        cell = by_ffc[ffc][source_sink]
        if module_name in cell:
            cell[module_name].append(module)
        else:
            cell[module_name] = ModuleList([module])
        module.name = (module_name, len(cell[module_name]) - 1)

    return {
        (ffc, ss): Container(by_ffc[ffc][ss])
        for ffc in _FFC_KEYS
        for ss in _SOURCE_SINK_KEYS
    }


def get_subcontainers(modules):
    """Public alias mirroring the reference (``module_container.py:355-413``)."""
    return _build_subcontainers(modules)


class ModuleContainer(Container):
    """Top-level container over all of a microgrid's modules."""

    def __init__(self, modules):
        self._containers = _build_subcontainers(modules)
        midlevels = self._set_midlevel()
        self._types_by_name = {
            name: container_type
            for container_type, container in self._containers.items()
            for name in container
        }
        super().__init__(**midlevels)

    def _set_midlevel(self):
        midlevels = dict()
        for (ffc, source_sink), subcontainer in self._containers.items():
            midlevels.setdefault(ffc, {})[source_sink] = subcontainer
            midlevels.setdefault(source_sink, {})[ffc] = subcontainer
        return {k: Container(**v) for k, v in midlevels.items()}

    def names(self):
        return list(self._types_by_name.keys())

    @property
    def containers(self):
        return self._containers
