package graft.core

/** Runtime numerics configuration (reference `Henbun/_settings.py` +
  * `henbunrc`: float width, jitter level, optional ±clip, verbosity).
  * A case class with a stack-based temporary override, mirroring the
  * reference's `temp_settings` context manager.
  *
  * Float width: the reference DEFAULTS to float32 (`henbunrc:7-8`);
  * here the default is float64 — a deliberate deviation (SURVEY §4):
  * the DuckDB oracle hash-matching requires double precision. Selecting
  * [[Settings.Float32]] truncates the DATA plane to float32-representable
  * values at ingestion (the analog of the reference casting fed arrays
  * to `float_type`, `param.py:689-699`); accumulation stays in double
  * registers, as on any float32 GPU kernel with fp32 accumulate —
  * agreement with the float64 path is tolerance-level, not bit-level.
  * The flag is sampled when a [[graft.data.DataSet]] /
  * [[graft.optimize.Elbo]] is CONSTRUCTED (dtype is a property of the
  * built pipeline, as in the reference where the graph is built under
  * the current settings).
  */
final case class Settings(
    floatType: Settings.FloatType = Settings.Float64,
    jitterLevel: Double = 1e-5,
    clipping: Boolean = false,
    clipMax: Double = 50.0,
    verbosity: Int = 0)

object Settings {

  /** Float width (reference `_settings.py:97-98` dtype selection). */
  sealed trait FloatType extends Serializable {
    /** Round a double to this width's representable grid. */
    def narrow(x: Double): Double
  }
  case object Float64 extends FloatType {
    def narrow(x: Double): Double = x
  }
  case object Float32 extends FloatType {
    def narrow(x: Double): Double = x.toFloat.toDouble
  }

  private var stack: List[Settings] = List(Settings())

  def current: Settings = stack.head

  /** Push a temporary configuration for the duration of `body`
    * (reference `temp_settings`, `_settings.py:120-149`). */
  def withSettings[A](s: Settings)(body: => A): A = {
    stack = s :: stack
    try body finally { stack = stack.tail }
  }
}
