package graft.cdc

import java.sql.Timestamp

/** Typed row model of a change-stream event (SURVEY §1.1/§1.4).
  * Field order matches ChangeEvents.schema; open sub-documents are
  * extended-JSON strings.
  */
case class ResumeToken(_data: String)

case class Ns(db: String, coll: String)

case class UpdateDescription(
    updatedFields: String,
    removedFields: Seq[String],
    truncatedArrays: Seq[String])

case class ChangeEventRow(
    _id: ResumeToken,
    operationType: String,
    clusterTime: Timestamp,
    wallTime: Timestamp,
    ns: Ns,
    documentKey: Option[String],
    fullDocument: Option[String],
    fullDocumentBeforeChange: Option[String],
    updateDescription: Option[UpdateDescription])

/** Durable resume-token record, shape-compatible with the reference's
  * `SavedToken` (`models.py:10-13`, stored via
  * `committing/token_saver.py:51-56`).
  */
case class SavedToken(
    streamReaderName: String,
    token: String,
    date: Timestamp)
