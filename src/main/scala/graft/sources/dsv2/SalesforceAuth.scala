package graft.sources.dsv2

import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Typed credential surface of the connector — the Scala analog of the
  * reference's six-way `SalesforceAuth` union + `make_salesforce_client`
  * dispatch (`salesforce/helpers/client.py:38-214`). Each strategy is a case
  * class whose constructor enforces the same required/either-or rules the
  * reference enforces in `on_resolved`, so a bad credential set fails at
  * *planning* time with a named error, never mid-extraction.
  */
sealed trait SalesforceAuth
object SalesforceAuth {

  /** OAuth 2.0 username-password flow w/ security token (`client.py:39-47`). */
  final case class SecurityToken(userName: String, password: String, securityToken: String)
      extends SalesforceAuth

  /** Trusted-IP-ranges / organization-id auth (`client.py:50-58`). */
  final case class OrganizationId(userName: String, password: String, organizationId: String)
      extends SalesforceAuth

  /** Direct session access (`client.py:61-76`): session id + one of
    * instance / instanceUrl.
    */
  final case class Instance(sessionId: String, instance: Option[String],
                            instanceUrl: Option[String]) extends SalesforceAuth {
    require(instance.nonEmpty || instanceUrl.nonEmpty,
      "instance auth requires either 'instance' or 'instanceUrl'")
  }

  /** Connected-app username-password flow (`client.py:79-88`). */
  final case class ConsumerKeySecret(userName: String, password: String,
                                     consumerKey: String, consumerSecret: String)
      extends SalesforceAuth

  /** OAuth 2.0 JWT bearer flow (`client.py:91-109`): one of privateKey /
    * privateKeyFile.
    */
  final case class Jwt(userName: String, consumerKey: String,
                       privateKey: Option[String], privateKeyFile: Option[String])
      extends SalesforceAuth {
    require(privateKey.nonEmpty || privateKeyFile.nonEmpty,
      "jwt auth requires either 'privateKey' or 'privateKeyFile'")
  }

  /** OAuth 2.0 client-credentials flow (`client.py:112-121`): domain comes
    * from the credentials, not the shared config (`client.py:199-211`).
    */
  final case class ClientCredentials(consumerKey: String, consumerSecret: String,
                                     domain: String) extends SalesforceAuth

  private val strategies = Seq("security_token", "organization_id", "instance",
    "consumer_key_secret", "jwt", "client_credentials")

  /** Resolve credentials from connector options.
    *
    * With `auth=<strategy>` the named strategy is built and every missing
    * field is reported; without it the strategy is inferred from which
    * fields are present (the union-resolution the reference gets from dlt's
    * configspec). No credential options at all → None (the offline fake API
    * needs none).
    */
  def fromOptions(opts: CaseInsensitiveStringMap): Option[SalesforceAuth] = {
    def get(k: String): Option[String] =
      Option(opts.get(k)).map(_.trim).filter(_.nonEmpty)
    def need(strategy: String, k: String): String = get(k).getOrElse(
      throw new IllegalArgumentException(s"auth strategy '$strategy' requires option '$k'"))

    def build(strategy: String): SalesforceAuth = strategy match {
      case "security_token" => SecurityToken(need(strategy, "username"),
        need(strategy, "password"), need(strategy, "securityToken"))
      case "organization_id" => OrganizationId(need(strategy, "username"),
        need(strategy, "password"), need(strategy, "organizationId"))
      case "instance" => Instance(need(strategy, "sessionId"),
        get("instance"), get("instanceUrl"))
      case "consumer_key_secret" => ConsumerKeySecret(need(strategy, "username"),
        need(strategy, "password"), need(strategy, "consumerKey"), need(strategy, "consumerSecret"))
      case "jwt" => Jwt(need(strategy, "username"), need(strategy, "consumerKey"),
        get("privateKey"), get("privateKeyFile"))
      case "client_credentials" => ClientCredentials(need(strategy, "consumerKey"),
        need(strategy, "consumerSecret"), need(strategy, "domain"))
      case other => throw new IllegalArgumentException(
        s"unknown auth strategy '$other'; expected one of ${strategies.mkString(", ")}")
    }

    get("auth") match {
      case Some(explicit) => Some(build(explicit))
      case None =>
        // Inference mirrors the reference's union order (client.py:123-130):
        // the most specific discriminating field wins.
        val inferred =
          if (get("securityToken").nonEmpty) Some("security_token")
          else if (get("organizationId").nonEmpty) Some("organization_id")
          else if (get("sessionId").nonEmpty) Some("instance")
          else if (get("privateKey").nonEmpty || get("privateKeyFile").nonEmpty) Some("jwt")
          else if (get("domain").nonEmpty && get("consumerKey").nonEmpty) Some("client_credentials")
          else if (get("consumerKey").nonEmpty) Some("consumer_key_secret")
          else if (get("username").nonEmpty || get("password").nonEmpty)
            throw new IllegalArgumentException(
              "incomplete credentials: username/password given but no discriminating field " +
                "(securityToken, organizationId, sessionId, privateKey, consumerKey)")
          else None
        inferred.map(build)
    }
  }
}
