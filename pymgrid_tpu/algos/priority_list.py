"""Priority-list machinery shared by RBC and the discrete env.

Mirrors ``src/pymgrid/algos/priority_list/``: a priority list is an ordering
of the controllable source elements (gensets contribute one element per goal
status); populating an action walks the list, deploying each module against
the remaining net load.
"""
from dataclasses import dataclass
from functools import total_ordering
from itertools import permutations
from typing import Optional, Tuple

import numpy as np

__all__ = ["PriorityListElement", "PriorityListAlgo"]


@total_ordering
@dataclass(frozen=True)
class PriorityListElement:
    """A module's position in a deployment order.

    Ordering is by marginal cost, ties broken by larger ``action``
    (status=on first); see reference ``priority_list_element.py:62-80``.
    """

    module: Tuple[str, int]
    module_actions: int
    action: int
    marginal_cost: Optional[float] = None

    def __eq__(self, other):
        if type(self) != type(other):
            return NotImplemented
        return (
            self.module == other.module
            and self.module_actions == other.module_actions
            and self.action == other.action
            and self.marginal_cost == other.marginal_cost
        )

    def __lt__(self, other):
        if type(self) != type(other) or self.marginal_cost is None or other.marginal_cost is None:
            return NotImplemented
        return self.marginal_cost < other.marginal_cost or (
            self.marginal_cost == other.marginal_cost and self.action > other.action
        )


class PriorityListAlgo:
    """Mixin implementing priority-list enumeration and action population."""

    def get_priority_lists(self, remove_redundant_gensets):
        controllable_sources = [
            PriorityListElement(
                module.name, module.action_space.shape[0], n_actions, module.marginal_cost
            )
            for module in self.modules.controllable.sources.iterlist()
            for n_actions in range(module.action_space.shape[0])
        ]
        controllable_sources.extend(
            PriorityListElement(
                module.name, module.action_space.shape[0], n_actions, module.marginal_cost
            )
            for module in self.modules.controllable.source_and_sinks.iterlist()
            for n_actions in range(module.action_space.shape[0])
        )

        priority_lists = self._remove_redundant_actions(
            permutations(controllable_sources), gensets=remove_redundant_gensets
        )
        return priority_lists

    def _remove_redundant_actions(self, priority_lists, gensets=False):
        pls = []
        for pl in priority_lists:
            seen, deduped = set(), []
            for el in pl:
                if el.module in seen:
                    continue
                seen.add(el.module)
                deduped.append(el)
            pls.append(tuple(deduped))

        unique_pls = list(dict.fromkeys(pls))
        if gensets:
            unique_pls = self._remove_redundant_gensets(unique_pls)
        return unique_pls

    def _remove_redundant_gensets(self, priority_lists):
        """Drop lists containing a genset-off element when the genset's
        minimum production is zero (the off action is then redundant)."""
        from pymgrid_tpu.modules import GensetModule

        redundant = []
        for module_name, module_list in self.modules.iterdict():
            for module_n, module in enumerate(module_list):
                if isinstance(module, GensetModule) and module.running_min_production == 0:
                    redundant.append(
                        PriorityListElement(
                            module=(module_name, module_n),
                            module_actions=2,
                            action=0,
                            marginal_cost=module.marginal_cost,
                        )
                    )
        return [
            pl for pl in priority_lists if not any(el in pl for el in redundant)
        ]

    def _populate_action(self, priority_list):
        action = self.get_empty_action()
        loads, total_load = self._get_load()
        renewable = self._get_renewable()
        assert total_load >= 0 and renewable >= 0

        remaining_load = (total_load - renewable).item()

        for element in priority_list:
            module_name, module_number = element.module
            total_module_actions = element.module_actions
            module_action_number = element.action
            module_to_deploy = self.modules[module_name][module_number]

            if total_module_actions > 1:
                if action[module_name][module_number] is not None:
                    continue
                action[module_name][module_number] = [module_action_number]

            if np.isclose(remaining_load, 0.0, atol=1e-4):
                module_energy = 0.0
            elif remaining_load > 0:
                module_energy = self._produce_from_module(
                    module_action_number, module_to_deploy, remaining_load
                )
            else:
                module_energy = self._consume_in_module(module_to_deploy, remaining_load)

            try:
                action[module_name][module_number].append(module_energy)
            except AttributeError:
                action[module_name][module_number] = module_energy

            remaining_load -= module_energy

            if total_module_actions > 1:
                action[module_name][module_number] = np.array(
                    action[module_name][module_number]
                )

        bad_keys = [k for k, v in action.items() if v is None]
        if bad_keys:
            raise RuntimeError(
                f"None values found in action, corresponding to keys\n\t{bad_keys}"
            )
        return action

    def _consume_in_module(self, module_to_deploy, remaining_load):
        assert remaining_load <= 0.0
        if module_to_deploy.is_sink:
            module_max_consumption = module_to_deploy.max_consumption
            assert module_max_consumption >= 0
            if -1 * remaining_load > module_max_consumption:
                module_consumption = -1.0 * module_max_consumption
            else:
                module_consumption = remaining_load
        else:
            module_consumption = 0.0
        assert module_consumption <= 0
        return module_consumption

    def _produce_from_module(self, module_action_number, module_to_deploy, remaining_load):
        try:
            max_production = module_to_deploy.next_max_production(module_action_number)
            min_production = module_to_deploy.next_min_production(module_action_number)
        except AttributeError:
            max_production = module_to_deploy.max_production
            min_production = module_to_deploy.min_production
        if min_production <= remaining_load <= max_production:
            module_production = remaining_load
        elif remaining_load < min_production:
            module_production = min_production
        else:
            module_production = max_production
        assert module_production >= 0
        return module_production

    def _get_load(self):
        loads, total_load = dict(), 0.0
        for fixed_sink in self.fixed.sinks.iterlist():
            loads[fixed_sink.name] = fixed_sink.max_consumption
            total_load += fixed_sink.max_consumption
        return loads, total_load

    def _get_renewable(self):
        return np.sum(
            [flex_source.max_production for flex_source in self.flex.sources.iterlist()]
        )

    # implemented by hosts (env / RBC)
    @property
    def modules(self):
        raise NotImplementedError

    @property
    def fixed(self):
        raise NotImplementedError

    @property
    def flex(self):
        raise NotImplementedError

    def get_empty_action(self):
        raise NotImplementedError
