package graft.core

/** Runtime numerics configuration (reference `Henbun/_settings.py` +
  * `henbunrc`: jitter level, optional ±clip, verbosity). A case class
  * with a stack-based temporary override, mirroring the reference's
  * `temp_settings` context manager. Float width is fixed at float64 —
  * a deliberate deviation (SURVEY §4): the DuckDB oracle hash-matching
  * requires double precision.
  */
final case class Settings(
    jitterLevel: Double = 1e-5,
    clipping: Boolean = false,
    clipMax: Double = 50.0,
    verbosity: Int = 0)

object Settings {
  private var stack: List[Settings] = List(Settings())

  def current: Settings = stack.head

  /** Push a temporary configuration for the duration of `body`
    * (reference `temp_settings`, `_settings.py:120-149`). */
  def withSettings[A](s: Settings)(body: => A): A = {
    stack = s :: stack
    try body finally { stack = stack.tail }
  }
}
