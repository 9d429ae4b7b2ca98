package graft.sources

/** Copernicus-style SESSION auth — the login-exchange-then-fetch flow of
  * the reference's `copernicus_resource.py:34-38` (a credentialed client
  * login precedes every product search/download). [[HttpFetch]]'s header
  * seam carries STATIC auth; this closes the dynamic half: POST the
  * credentials once, extract the session token from the login response,
  * and hand downstream fetches a ready Authorization header.
  *
  * Credential hygiene (the part worth engineering): the credential and
  * the token live only in memory — they are handed to [[HttpFetch]] /
  * [[CdsJobs]] as request HEADERS, and neither ever appears in a
  * manifest line (manifests record url/dest/bytes and job status URLs
  * only — the spec greps the manifest bytes for the secret to prove it).
  */
object CopernicusAuth {

  /** POST a credentialed login to `loginUrl` (form-encoded, the
    * Copernicus identity shape) and return the Authorization header map
    * for downstream requests. 4xx (bad credential) is fatal
    * immediately; 5xx/IO retried per the policy like every other call.
    */
  def login(loginUrl: String, username: String, password: String,
      extraForm: Map[String, String] = Map.empty,
      tokenField: String = "access_token",
      policy: HttpFetch.RetryPolicy = HttpFetch.ReferencePolicy,
      connectTimeoutMs: Int = 10000,
      readTimeoutMs: Int = 60000): Map[String, String] = {
    def enc(s: String) =
      java.net.URLEncoder.encode(s, java.nio.charset.StandardCharsets.UTF_8)
    val form = (Map("username" -> username, "password" -> password) ++
      extraForm).map { case (k, v) => s"${enc(k)}=${enc(v)}" }.mkString("&")
    val text = CdsJobs.control(loginUrl, "POST", Some(form), policy,
      Map("Content-Type" -> "application/x-www-form-urlencoded"),
      connectTimeoutMs, readTimeoutMs)
    val token = CdsJobs.jsonField(text, tokenField)
    require(token != null, s"login response carries no '$tokenField'")
    Map("Authorization" -> s"Bearer $token")
  }
}
