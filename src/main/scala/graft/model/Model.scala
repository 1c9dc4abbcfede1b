package graft.model

import graft.core.Scenario

/** Pluggable model hook (reference: ixmp/model/base.py:22-206 —
  * Model.initialize/enforce/run; registered in MODELS,
  * model/__init__.py:10-15). The GAMS/GDX subprocess round-trip of the
  * reference (model/gams.py:366-481) is replaced by adapters that read
  * item DataFrames and write solution DataFrames directly. */
trait ModelAdapter {
  def name: String
  /** Populate required items on a fresh scenario (Model.initialize). */
  def initialize(s: Scenario): Unit = {}
  /** Solve and write var/equ levels/marginals into the scenario. */
  def run(s: Scenario): Unit
}

/** Registry mirroring ixmp.model.MODELS (model/__init__.py:10-15). */
object Models {
  // volatile: register() writes under the lock, but readers (e.g. a
  // concurrent solve) need the happens-before edge too or they can
  // observe a stale map missing a just-registered adapter
  @volatile private var registry = Map.empty[String, ModelAdapter]
  def register(m: ModelAdapter): Unit = synchronized { registry += m.name -> m }
  def apply(name: String): ModelAdapter = registry.getOrElse(name,
    throw new NoSuchElementException(s"no model '$name' registered"))
  register(DantzigModel)
}
